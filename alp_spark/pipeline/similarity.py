"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path is
sign-random-projection LSH bucketing, which turns the O(N·Q) scan into
a bucket-co-partitioned join. Dot products stay JVM-side via
``zip_with`` + ``aggregate`` (whole-stage codegen over the array), cast
to double in array order so the DuckDB oracle (list_dot_product over
DOUBLE[]) reproduces sums bit-for-bit.

Scale notes: the query side is broadcast (top-k search is Q ≪ N); the
candidate scan is embarrassingly parallel over the embedding table's
partitions; per-partition top-k happens inside the window's partial
sort before the final k-row shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in array order, double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k neighbours for the first ``n_queries`` ids.

    Returns (query_id, rank, neighbor_id, cos) — cos rounded to 1e-5,
    rank by unrounded cosine with neighbor-id tiebreak.
    """
    q = F.broadcast(
        emb.where(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("_cos", 5).alias("cos"),
        )
    )


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.

    ``candidates``: optional (id_a, id_b) pair table (e.g. from
    :func:`srp_candidate_pairs`) — exact cosine is computed for ONLY
    those pairs via two id-equi-joins (LSH-then-verify, the 100 TB
    path). ``block_col``: optional blocking key restricting comparisons
    to same-block pairs. Omit both for exact all-pairs at small scale.
    """
    if candidates is not None:
        j = (
            candidates.join(
                emb.select(
                    F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
                ),
                on="id_a",
            )
            .join(
                emb.select(
                    F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
                ),
                on="id_b",
            )
        )
        return (
            j.select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("_cos"))
            .where(F.col("_cos") >= threshold)
            .select("id_a", "id_b", F.round("_cos", 5).alias("cos"))
        )
    cols = [F.col(id_col), F.col(vec_col)] + (
        [F.col(block_col)] if block_col else []
    )
    base = emb.select(*cols)
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        *([F.col(block_col)] if block_col else []),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        *([F.col(block_col)] if block_col else []),
    )
    on = [block_col] if block_col else None
    joined = a.join(b, on=on) if on else a.crossJoin(b)
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("_cos"))
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 5).alias("cos"))
    )


def srp_planes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    """The deterministic SRP hyperplane sample — exposed so SQL oracles
    can bake the identical float64 literals into their plans."""
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def srp_bucket(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 7
) -> Column:
    """Sign-random-projection LSH bucket of an embedding as a bit string.

    Hyperplanes are a deterministic ``np.random.RandomState(seed)``
    Gaussian sample baked into the plan as literals — every executor
    (and every rerun) sees identical planes.
    """
    planes = srp_planes(dim, n_planes, seed)
    bits = []
    for p in planes:
        lit = F.array(*[F.lit(float(w)) for w in p])
        bits.append(F.when(_dot(vec, lit) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def srp_candidate_pairs(
    emb: DataFrame,
    dim: int,
    n_bands: int = 4,
    band_bits: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded SRP LSH (the cosine
    analog of MinHash banding): ``n_bands`` independent ``band_bits``-bit
    sign-projection keys per vector; a pair is a candidate when ANY band
    key collides. One explode + one equi-join on (band, key) — never a
    cross product; key space is balanced by construction (random
    hyperplanes), so the join does not skew. Recall/precision tune via
    (n_bands, band_bits): more bits per band prune harder, more bands
    recover recall — raise band_bits at larger corpus sizes.

    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    planes = srp_planes(dim, n_bands * band_bits, seed)

    def band_key(b: int) -> Column:
        bits = []
        for r in range(band_bits):
            lit = F.array(*[F.lit(float(w)) for w in planes[b * band_bits + r]])
            bits.append(
                F.when(_dot(F.col(vec_col), lit) > 0, F.lit("1")).otherwise(F.lit("0"))
            )
        return F.concat(*bits)

    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_key(b).alias("key"))
            for b in range(n_bands)
        ]
    )
    keyed = emb.select(F.col(id_col).alias("doc"), F.explode(bands).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = keyed.select(F.col("doc").alias("id_a"), "band", "key")
    b = keyed.select(F.col("doc").alias("id_b"), "band", "key")
    return (
        a.join(b, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_ann_topk(
    emb: DataFrame,
    dim: int,
    k: int = 3,
    n_queries: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP-bucketed candidate generation + exact
    rerank inside the bucket. One equi-join on the bucket key instead
    of a full cross product — the 100 TB-shaped plan (bucket keys are
    uniform by construction, so the join does not skew).
    """
    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), srp_bucket(F.col(vec_col), dim, n_planes, seed).alias("_bkt")
    )
    q = F.broadcast(
        bucketed.where(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_bkt"
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_bkt"
    )
    scored = (
        q.join(c, on="_bkt")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("_qv"), F.col("_cv")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("_cos", 5).alias("cos"),
        )
    )
