"""Canonical PageRank with dangling-node correction.

Transliterates the *semantics* of the reference
(include/graphblas/algorithms/simple_pagerank.hpp:134-494) into a
driver-side loop over DataFrame jobs:

- init pr = 1/n (dense)                       (simple_pagerank.hpp:200)
- row sums via the (plus, left_assign_if) pattern ring with transpose
  (simple_pagerank.hpp:210-222) → out-degrees; absent = dangling row
- inv[i] = α/rowsum[i], dangling rows stay absent
  (simple_pagerank.hpp:241-249 keeps 0; sparse-absent ≡ 0 here)
- per iteration (simple_pagerank.hpp:286-451):
    dangling  = Σ pr[i] over dangling i        (foldl<invert_mask>, :312)
    scaled    = pr ⊗ inv  (intersection drops dangling rows, :291-302)
    d         = (α·dangling + 1 - α)/n                            (:351)
    pr'       = scaled · L + d     (vxm plus-times, :361; + fold, :402)
    residual  = Σ|pr' - pr|        (dot under (add, abs_diff), :433-437)
    stop when residual ≤ conv or iter == max

Scale design: the only per-iteration shuffles are the vxm groupBy(dst)
(map-side partial aggregation absorbs hub in-degree skew) and one id-join;
residual AND the *next* iteration's dangling mass are computed in a single
action over one joined frame, so each iteration costs exactly one job
after the pipeline warms. ``pr`` is localCheckpoint'ed every iteration to
truncate lineage (resumable parquet checkpoints are layered on by
:mod:`alp_spark.checkpoint` when a checkpointer is passed).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import algebra as alg
from ..containers import ID, VAL, set_dense
from ..operators import vxm
from ..operators.blas2 import BROADCAST_NNZ_THRESHOLD

#: 'auto' broadcasts the dense rank vector up to this n. 16x the sparse
#: frontier threshold (blas2.BROADCAST_NNZ_THRESHOLD) ≈ 256 MB of
#: (id, val) pairs per executor as a broadcast hash table — sized for
#: >= 4 GB executors; pass a smaller ``dense_broadcast_nnz`` (or
#: strategy='shuffle') on memory-constrained clusters. The win it buys:
#: the persisted dst-partitioned edge table is never re-shuffled, so
#: each iteration runs with ZERO Exchange.
DENSE_BROADCAST_NNZ = 16 * BROADCAST_NNZ_THRESHOLD


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id, val)
    iterations: int
    residual: float
    residuals: list[float] = field(default_factory=list)


def simple_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    alpha: float = 0.85,
    conv: float = 1e-7,
    max_iter: int = 1000,
    checkpointer=None,
    checkpoint_every: int = 5,
    initial: DataFrame | None = None,
    start_iteration: int = 0,
    strategy: str = "auto",
    dense_broadcast_nnz: int = DENSE_BROADCAST_NNZ,
    teleport: DataFrame | None = None,
) -> PageRankResult:
    """Run PageRank to convergence; defaults mirror the reference
    (α=0.85, conv=1e-7, max=1000 — simple_pagerank.hpp:140-142).

    ``teleport``: optional personalization vector (id, val), val ≥ 0
    summing to 1 — the teleport + dangling mass lands on these vertices
    ∝ val instead of uniformly (personalized PageRank). Vertices absent
    from the frame get teleport 0; iteration starts from the teleport
    distribution. ``teleport=None`` keeps the reference-uniform path
    bit-for-bit (the uniform case divides by n rather than multiplying
    by a 1/n teleport value, so existing oracles are unaffected).

    ``strategy``: vxm join strategy per iteration. 'auto' broadcasts the
    (always dense) rank vector when it fits executor memory
    (n ≤ ``dense_broadcast_nnz``, see :data:`DENSE_BROADCAST_NNZ` for
    the memory math), so the edge table — persisted here once — is
    never re-shuffled; larger graphs fall back to the shuffle hash join.
    The analog of the reference's CRS/CCS loop-size strategy choice
    (reference/blas2.hpp:1104-1145).
    """
    if not 0 < alpha < 1 or max_iter <= 0:
        raise ValueError("alpha must be in (0,1), max_iter > 0")  # ILLEGAL checks

    if strategy == "auto":
        strategy = "broadcast" if n <= dense_broadcast_nnz else "shuffle"
    we_persisted = False
    if not edges.storageLevel.useMemory:
        # pre-partition by dst ONCE (broadcast strategy): the broadcast
        # hash join preserves this partitioning, so every iteration's
        # groupBy(dst) runs exchange-free. The partition count is
        # size-derived (guide §2), capped at the conf parallelism — at
        # scale this is exactly the old conf-sized layout.
        from ..plans.partitions import cache_sized

        edges, _ = cache_sized(
            spark, edges, key="dst" if strategy == "broadcast" else None
        )
        we_persisted = True

    # --- prelude: inverted scaled out-degrees -------------------------------
    # A pattern matrix normalizes by out-degree (count); a weighted
    # matrix (VAL column present) normalizes by out-WEIGHT — the per-
    # iteration vxm below already multiplies by the matrix value, so
    # switching only this prelude ring yields exact weighted PageRank
    # (rank flows ∝ w/Σ_out w). Reference PageRank is pattern-only
    # (simple_pagerank.hpp:210-222); the weighted path serves coarsened
    # graphs (e.g. host-level rollups carrying link multiplicities).
    row_ring = alg.PLUS_TIMES if VAL in edges.columns else alg.PLUS_FIRST
    ones = set_dense(spark, n, 1.0)
    # the prelude row-sum uses the same strategy gate as the loop: the
    # dense ones vector broadcasts when n fits, so the cached edge
    # table is never shuffled for the degree pass either
    inv = (
        vxm(ones, edges, row_ring, transpose=True, strategy=strategy)
        .select(F.col(ID), (F.lit(alpha) / F.col(VAL)).alias("inv"))
        .persist()
    )
    inv.count()
    inv_small = None
    if n <= BROADCAST_NNZ_THRESHOLD:
        inv_small = F.broadcast(inv)

    tele = None
    if teleport is not None:
        # densify to all n rows (non-seed vertices still RECEIVE link
        # mass, so the iterate must stay dense) and pin the plan
        tele = (
            set_dense(spark, n, 0.0)
            .join(teleport.select(ID, F.col(VAL).alias("_t")), on=ID, how="left")
            .select(ID, F.coalesce(F.col("_t"), F.lit(0.0)).alias("_tele"))
            .persist()
        )
        tele.count()

    if initial is not None:
        pr = initial
    elif tele is not None:
        pr = tele.select(ID, F.col("_tele").alias(VAL))  # pr0 = v
    else:
        pr = set_dense(spark, n, 1.0 / n)
    pr = pr.localCheckpoint(eager=True)

    # initial dangling mass: Σ pr over ids absent from inv
    dangling = (
        pr.join(inv, on=ID, how="left_anti").agg(F.sum(VAL).alias("d")).collect()[0]["d"]
        or 0.0
    )

    iters = start_iteration
    residual = float("inf")
    residuals: list[float] = []
    while True:
        if tele is None:
            add = F.lit((alpha * dangling + 1.0 - alpha) / n)
        else:
            # personalized: the same scalar mass lands ∝ teleport value
            add = F.lit(alpha * dangling + 1.0 - alpha) * F.col("_tele")

        # scaled = pr ⊗ inv (intersection); new = scaled·L (sparse);
        # next = coalesce(new, 0) + teleport share, carried with the old
        # value for the fused agg
        scaled = (
            pr.join(inv_small if inv_small is not None else inv, on=ID, how="inner")
            .select(F.col(ID), (F.col(VAL) * F.col("inv")).alias(VAL))
        )
        new = vxm(scaled, edges, alg.PLUS_TIMES, strategy=strategy)
        base = pr.alias("p").join(new.alias("m"), on=ID, how="left")
        if tele is not None:
            base = base.join(tele, on=ID)
        nxt = (
            base
            .join(inv.select(ID, F.lit(True).alias("_has_out")), on=ID, how="left")
            .select(
                F.col(ID),
                (F.coalesce(F.col(f"m.{VAL}"), F.lit(0.0)) + add).alias(VAL),
                F.col(f"p.{VAL}").alias("_old"),
                F.col("_has_out"),
            )
        )
        # lazy: the fused agg below materializes the checkpoint — one
        # job per iteration (old pr stays cached until then)
        nxt = nxt.localCheckpoint(eager=False)

        # ONE action: L1 residual + next iteration's dangling mass
        row = nxt.agg(
            F.sum(F.abs(F.col(VAL) - F.col("_old"))).alias("residual"),
            F.sum(F.when(F.col("_has_out").isNull(), F.col(VAL))).alias("dangling"),
        ).collect()[0]
        residual = float(row["residual"])
        dangling = float(row["dangling"] or 0.0)
        residuals.append(residual)

        old = pr
        pr = nxt.select(ID, VAL)
        old.unpersist()
        iters += 1

        if checkpointer is not None and iters % checkpoint_every == 0:
            checkpointer.save(pr, superstep=iters, metrics={"residual": residual})

        if (conv != 0.0 and residual <= conv) or iters >= max_iter:
            break

    inv.unpersist()
    if tele is not None:
        tele.unpersist()
    if we_persisted:
        edges.unpersist()
    if checkpointer is not None:
        checkpointer.save(pr, superstep=iters, metrics={"residual": residual}, final=True)
    return PageRankResult(ranks=pr, iterations=iters, residual=residual, residuals=residuals)


def simple_pagerank_csr(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    alpha: float = 0.85,
    conv: float = 1e-7,
    max_iter: int = 1000,
    n_partitions: int | None = None,
    checkpointer=None,
    checkpoint_every: int = 5,
    max_driver_n: int = 1_000_000_000,
    engine: str = "auto",
    seg_transport: str = "files",
) -> PageRankResult:
    """Same semantics as :func:`simple_pagerank`, executed over one-time
    packed CSR edge blocks (north-star physical form; see
    :mod:`alp_spark.plans.csr_blocks`).

    Per iteration: ONE ``mapInPandas`` pass over the cached blocks (no
    edge shuffle) + one small collect; all O(n) vector algebra (scale,
    dangling fold, residual) runs as driver numpy — the analog of ALP's
    fused ``eWiseLambda`` steps (simple_pagerank.hpp:291-302/402-416).
    The rank-vector hand-off picks its transport automatically (local →
    file, cluster → TorrentBroadcast; csr_blocks.spmv_dense).

    ``engine``: 'driver' keeps the O(n) vector algebra on the driver
    (fastest at small n — no per-superstep shuffle); 'segments' runs it
    executor-side over per-range segment files with O(P) driver traffic
    (:mod:`alp_spark.plans.csr_segloop`); 'auto' switches to 'segments'
    above ``max_driver_n`` (default 10^9 ≈ 8 GB of f64 on the driver) —
    the loop-size strategy switch of reference/blas2.hpp:1104, now with
    no driver ceiling at all on the far side. ``seg_transport`` picks
    the segments engine's exchange: 'files' (cache_dir; shared storage
    on clusters) or 'shuffle' (shared-nothing keyed shuffle — stock
    multi-executor clusters, csr_segloop module docstring).
    """
    import numpy as np

    from ..plans.csr_blocks import build_csr_blocks, spmv_dense

    if not 0 < alpha < 1 or max_iter <= 0:
        raise ValueError("alpha must be in (0,1), max_iter > 0")
    if engine not in ("auto", "driver", "segments"):
        raise ValueError("engine must be auto|driver|segments")
    if engine == "segments" or (engine == "auto" and n > max_driver_n):
        from ..plans.csr_segloop import pagerank_csr_segments

        csr = build_csr_blocks(spark, edges, n, n_partitions=n_partitions)
        try:
            seg = pagerank_csr_segments(
                spark, csr, edges, alpha=alpha, conv=conv, max_iter=max_iter,
                checkpointer=checkpointer, checkpoint_every=checkpoint_every,
                transport=seg_transport,
            )
            ranks = seg.ranks.localCheckpoint(eager=True)  # outlives the files
        finally:
            csr.unpersist()
        if checkpointer is not None:
            checkpointer.save(
                ranks, superstep=seg.iterations,
                metrics={"residual": seg.residual}, final=True,
            )
        return PageRankResult(
            ranks=ranks, iterations=seg.iterations,
            residual=seg.residual, residuals=seg.residuals,
        )

    csr = build_csr_blocks(spark, edges, n, n_partitions=n_partitions)

    # out-degrees (row sums of the pattern matrix) in one aggregation
    deg_pdf = (
        edges.groupBy(F.col("src").alias(ID))
        .agg(F.count("*").alias("deg"))
        .toPandas()
    )
    outdeg = np.zeros(n, dtype=np.float64)
    if len(deg_pdf):
        outdeg[deg_pdf[ID].to_numpy(dtype=np.int64)] = deg_pdf["deg"].to_numpy()
    dangling_mask = outdeg == 0.0
    inv = np.where(dangling_mask, 0.0, alpha / np.where(dangling_mask, 1.0, outdeg))

    pr = np.full(n, 1.0 / n, dtype=np.float64)
    iters, residual, residuals = 0, float("inf"), []
    while True:
        dangling = float(pr[dangling_mask].sum())
        d = (alpha * dangling + 1.0 - alpha) / n
        y = spmv_dense(spark, csr, pr * inv, combine="plus")
        nxt = y + d
        residual = float(np.abs(nxt - pr).sum())
        residuals.append(residual)
        pr = nxt
        iters += 1
        if checkpointer is not None and iters % checkpoint_every == 0:
            _save_np_ranks(spark, checkpointer, pr, iters, residual)
        if (conv != 0.0 and residual <= conv) or iters >= max_iter:
            break

    csr.unpersist()
    ranks = spark.createDataFrame(
        _np_ranks_pdf(pr), schema=f"{ID} long, {VAL} double"
    )
    if checkpointer is not None:
        checkpointer.save(ranks, superstep=iters, metrics={"residual": residual}, final=True)
    return PageRankResult(ranks=ranks, iterations=iters, residual=residual, residuals=residuals)


def _np_ranks_pdf(pr):
    import pandas as pd

    return pd.DataFrame({ID: range(len(pr)), VAL: pr})


def _save_np_ranks(spark, checkpointer, pr, iters, residual):
    df = spark.createDataFrame(_np_ranks_pdf(pr), schema=f"{ID} long, {VAL} double")
    checkpointer.save(df, superstep=iters, metrics={"residual": residual})
