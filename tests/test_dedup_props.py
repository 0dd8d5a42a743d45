"""Property tests for the dedup LSH operators.

The SimHash candidate-generation completeness guarantee (pigeonhole over
``max_hamming + 1`` chunks) is verified against a brute-force all-pairs
Hamming scan of the same signatures — every qualifying pair the exhaustive
scan finds must come back from the chunk-keyed join, at several radii.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.dedup import simhash64, simhash_near_dups

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _docs(seed: int, n: int) -> list[tuple[int, str]]:
    """Clusters of near-identical docs (1-2 word perturbations) so pairs
    land at a spread of small Hamming distances."""
    rng = random.Random(seed)
    out = []
    doc_id = 0
    while doc_id < n:
        base = [rng.choice(WORDS) for _ in range(12)]
        # two verbatim copies per cluster guarantee hamming-0 pairs exist
        # even at radius 0; further members are 0-2 word perturbations
        for k in range(rng.randint(3, 5)):
            if doc_id >= n:
                break
            perturbed = list(base)
            if k >= 2:
                for _ in range(rng.randint(0, 2)):
                    perturbed[rng.randrange(len(perturbed))] = rng.choice(WORDS)
            out.append((doc_id, " ".join(perturbed)))
            doc_id += 1
    return out


@pytest.mark.parametrize("max_hamming", [0, 3, 8, 14])
def test_simhash_candidates_complete_vs_brute_force(spark, max_hamming):
    docs = spark.createDataFrame(_docs(max_hamming + 7, 60), "doc_id long, text string")
    sigs = {
        r["doc_id"]: r["sig"]
        for r in docs.select("doc_id", simhash64(F.col("text")).alias("sig")).collect()
    }
    expected = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= max_hamming:
                expected.add((a, b, d))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dups(docs, max_hamming=max_hamming).collect()
    }
    assert got == expected
    assert expected, "degenerate test: no qualifying pairs generated"


def test_minhash_xxhash64_exact_dupes(spark):
    """The scale-path hash family (hash-once + per-slot long remix) must
    still give identical signatures to identical texts and emit exact
    duplicates at est_jaccard 1.0."""
    from ethereum_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text about spark shuffle planning"),
            (4, "another unrelated document mentioning catalyst optimizer rules"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4, hash_fn="xxhash64")
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got.get((1, 2)) == 1.0
    assert all(k == (1, 2) for k in got), got
