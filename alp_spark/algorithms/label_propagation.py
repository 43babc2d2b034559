"""Semi-supervised label propagation over a weighted symmetric graph.

Transliterates include/graphblas/algorithms/label.hpp:122-290 (random-walk
normalised propagation, Kamvar et al. 2003):

- diag[i] = Σ_j W[i,j] via mxv over plus-times with a ones vector
  (label.hpp:167); dinv = 1/diag (:184-187)
- iterate: fNext = W·f (mxv, :218); threshold fNext[i]·dinv[i] at 0.5
  into {0,1} (:228-231); clamp the first l seeded entries back (:238-242)
- converge when dot under (or, not_equal) finds no flip (:253);
  iteration budget ``iter < max_iterations`` starting at 1 (:210)

Returns exact {0,1} labels. The threshold+clamp step is a single Column
expression — no Python in the loop body; one mxv shuffle per iteration
plus one convergence action.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import algebra as alg
from ..containers import DST, ID, VAL, set_dense
from ..operators import mxv
from ..plans.partitions import cache_sized


@dataclass
class LabelPropResult:
    labels: DataFrame  # (id, val) ∈ {0.0, 1.0}
    iterations: int
    converged: bool  # reference returns FAILED when not


def label_propagation(
    spark: SparkSession,
    weighted_edges: DataFrame,  # (src, dst, val) symmetric
    y: DataFrame,  # (id, val) full initial labels; first l are seeds
    n: int,
    l: int,
    max_iterations: int = 1000,
) -> LabelPropResult:
    if l == 0 or n == 0:
        raise ValueError("need n > 0 and at least one seed (reference ILLEGAL)")

    # cache the matrix once in a size-derived layout: the diag pass AND
    # every iteration's mxv scan it (it was re-derived from the source
    # plan each time before — guide §2/§5)
    weighted_edges, _ = cache_sized(spark, weighted_edges, key=DST)

    ones = set_dense(spark, n, 1.0)
    dinv = (
        mxv(weighted_edges, ones, alg.PLUS_TIMES, frontier_nnz=n)
        .select(ID, (F.lit(1.0) / F.col(VAL)).alias("dinv"))
        .persist()
    )
    dinv.count()

    # seeds: ids [0, l) clamped to y (mask fixture semantics, label.hpp:193)
    seeds = y.where(F.col(ID) < l).select(ID, F.col(VAL).alias("_seed")).persist()

    f = y.localCheckpoint(eager=True)
    it = 1
    converged = False
    while it < max_iterations:
        fnext_raw = mxv(
            weighted_edges, f, alg.PLUS_TIMES, strategy="auto", frontier_nnz=n
        )
        fnext = (
            f.select(ID)
            .join(fnext_raw.select(ID, F.col(VAL).alias("_wx")), on=ID, how="left")
            .join(dinv, on=ID, how="left")
            .join(seeds, on=ID, how="left")
            .select(
                ID,
                F.coalesce(
                    F.col("_seed"),  # clamp seeded vertices
                    F.when(
                        F.coalesce(F.col("_wx"), F.lit(0.0)) * F.col("dinv") < 0.5,
                        F.lit(0.0),
                    ).otherwise(F.lit(1.0)),
                ).alias(VAL),
            )
        )
        # lazy: the flips count below materializes it (1 job/iteration;
        # f stays cached until that action)
        fnext = fnext.localCheckpoint(eager=False)
        # convergence: dot under (or, not_equal) — label.hpp:253
        flips = (
            f.alias("a")
            .join(fnext.alias("b"), on=ID)
            .where(F.col(f"a.{VAL}") != F.col(f"b.{VAL}"))
            .limit(1)
            .count()
        )
        f.unpersist()
        f = fnext
        if flips == 0:
            converged = True
            break
        it += 1

    dinv.unpersist()
    seeds.unpersist()
    weighted_edges.unpersist()
    return LabelPropResult(labels=f, iterations=it, converged=converged)
