"""HITS (hubs & authorities) — Kleinberg's power iteration, Spark-first.

The reference ships no HITS header; like triangle counting
(SURVEY.md §2.11) the north star asks for its composition from the
engine's own primitives, and HITS is the canonical PageRank companion
on web link graphs. Per round, two SpMVs over the (plus, times) ring:

    a = Aᵀ h   (authority: sum of hub scores over in-edges)
    h = A a    (hub: sum of authority scores over out-edges)

each followed by 2-norm normalisation — expressed as
``vxm``/``vxm(transpose=True)`` (base/blas2.hpp:307 vocabulary) plus a
norm fold (the base/blas1.hpp:4056 dot idiom).

Scale shape
-----------
Each round is two shuffle aggregations (map-side partial sums absorb
hub skew, the reference/blas2.hpp:1259-1265 analog) and two O(1)
scalar-norm actions — the same allreduce shape as PageRank's residual.
The normalisation itself is a literal multiply folded into the next
scan (no extra shuffle): c·(A x) = A (c·x) would even let the scalar
ride into the next SpMV, but materialising the normalised vector keeps
the per-round output exactly the textbook sequence the unrolled oracle
mirrors. Vectors stay sparse (vertices with no in/out edges are
structurally absent = 0); lineage is flattened by a lazy
localCheckpoint per round, so the 100-TB posture is identical to
``simple_pagerank``: edge table partitioned once, rounds bounded by the
pinned iteration budget.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import algebra as alg
from ..containers import ID, SRC, DST, VAL, vector_schema
from ..operators.blas2 import vxm


@dataclass
class HitsResult:
    auth: DataFrame  # (id, val) — authority scores, unit 2-norm
    hubs: DataFrame  # (id, val) — hub scores, unit 2-norm
    rounds: int


def _normalize(x: DataFrame) -> DataFrame:
    """Scale x to unit 2-norm (no-op on an all-zero/empty vector)."""
    norm = x.agg(F.sqrt(F.sum(F.col(VAL) * F.col(VAL)))).collect()[0][0]
    scale = 1.0 / norm if norm else 0.0
    return x.select(ID, (F.col(VAL) * F.lit(scale)).alias(VAL))


def hits(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    iters: int = 5,
) -> HitsResult:
    """Run ``iters`` HITS rounds on the directed edge table.

    Init h₀ = 1 on every vertex (the constant cancels under the
    first normalisation). Returns sparse vectors: a vertex absent
    from ``auth`` has no in-edges (score 0), absent from ``hubs`` no
    out-edges.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    E = edges.select(SRC, DST).persist()
    h = spark.range(n).select(
        F.col("id").alias(ID), F.lit(1.0).alias(VAL)
    )
    a = None
    for _ in range(iters):
        # authority: a[j] = Σ_{i→j} h[i]  (join src, group dst)
        a = _normalize(vxm(h, E, alg.PLUS_TIMES)).localCheckpoint(eager=False)
        # hub: h[i] = Σ_{i→j} a[j]  (join dst, group src)
        h = _normalize(
            vxm(a, E, alg.PLUS_TIMES, transpose=True)
        ).localCheckpoint(eager=False)
    E.unpersist()
    if a is None:  # pragma: no cover — guarded by iters >= 1
        a = spark.createDataFrame([], vector_schema("double"))
    return HitsResult(auth=a, hubs=h, rounds=iters)
