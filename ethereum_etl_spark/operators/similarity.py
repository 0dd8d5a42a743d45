"""Similarity search over embedding columns (array<float>).

- cosine / dot / l2 as zip_with/aggregate HOFs — JVM-side, no Python.
- brute-force top-k vs a query vector: broadcast the query, one pass.
- IVF-style bucketed ANN: assign vectors to nearest of K centroids once
  (build), probe only the nearest cell(s) at query time — the 100 TB path
  (scan 1/K of the data per query; cells are the partition key).
- LSH (random-hyperplane/SRP) bucketing: deterministic hyperplanes derived
  from md5 of (plane index, dim), so results are reproducible and
  oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _to_double(c: Column) -> Column:
    return F.transform(c, lambda v: v.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs one query vector. The query is a literal
    (broadcast by construction); one scan, one small top-k sort (Spark
    implements orderBy+limit as per-partition top-k + driver merge)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine(_to_double(F.col(vec_col)), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def nearest_centroid(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: argmax cosine over a small centroid set (the
    build side of IVF-ANN). Centroids are literals → no shuffle at all."""
    v = _to_double(F.col(vec_col))
    sims = F.array(
        *[
            F.struct(
                F.round(cosine(v, F.array(*[F.lit(float(x)) for x in c])), 6).alias("sim"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(sims)
    return embeddings.select(
        F.col(id_col),
        best["cid"].alias("centroid_id"),
        best["sim"].alias("cos_sim"),
    )


def rank_cells(centroids: list[list[float]], query_vec: list[float], n_probe: int) -> list[int]:
    """Probe-cell selection: centroid ids by descending (rounded) cosine to
    the query, ties to the lower id — mirrored exactly by the q40 oracle."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6) if na and nb else 0.0

    ranked = sorted(range(len(centroids)), key=lambda i: (-cos(centroids[i], query_vec), i))
    return ranked[:n_probe]


def ivf_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF-ANN query: rank centroids vs the query driver-side (a K-element
    literal computation), scan only the n_probe nearest cells, exact re-rank
    inside.

    ``assignments`` is the PERSISTED build artifact — an (id, centroid_id)
    table computed once by nearest_centroid and stored partitioned by
    centroid_id, so at scale the probe filter is partition pruning and each
    query reads 1/K of the data. Recomputing it here (assignments=None) is a
    convenience for ad-hoc use only: that path re-scans the full table per
    query and must not be the steady-state shape."""
    probe = rank_cells(centroids, query_vec, n_probe)
    if assignments is None:
        assignments = nearest_centroid(embeddings, centroids, id_col, vec_col)
    cell_ids = assignments.filter(F.col("centroid_id").isin(*probe)).select(id_col)
    cell = embeddings.join(cell_ids, on=id_col)
    return brute_force_topk(cell, query_vec, k, id_col, vec_col)


def srp_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection LSH: bucket = bit-vector of sign(v·h_p) for
    deterministic pseudo-random hyperplanes h_p (md5-seeded ±1 entries).
    Vectors sharing a bucket are ANN candidates — the similarity analog of
    MinHash banding; join/group on bucket, never all-pairs."""
    import hashlib

    def plane(p: int) -> list[float]:
        out = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            out.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        return out

    v = _to_double(F.col(vec_col))
    bucket = F.concat(
        *[
            F.when(dot(v, F.array(*[F.lit(x) for x in plane(p)])) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for p in range(n_planes)
        ]
    )
    return embeddings.select(F.col(id_col), bucket.alias("bucket"))


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: SRP-LSH bucket candidates →
    exact cosine verify ≥ threshold. The join is keyed on the bucket (never
    all-pairs); recall is the SRP collision probability (1 − θ/π)^n_planes
    per pair — the standard candidates-then-verify contract, with the
    deterministic md5-seeded hyperplanes making results reproducible."""
    b = srp_lsh_buckets(embeddings, n_planes, dim, id_col, vec_col)
    v = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(
        b.select(F.col(id_col).alias("id"), "bucket"), on="id"
    )
    x = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    y = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        x.join(y, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(_to_double(F.col("va")), _to_double(F.col("vb"))), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
