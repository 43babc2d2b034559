"""k-core decomposition by algebraic peeling.

Re-expresses the reference ``kcore_decomposition``
(include/graphblas/algorithms/kcore_decomposition.hpp:141-296, modelled
after Li et al., "The K-Core Decomposition Algorithm Under the Framework
of GraphBLAS", HPEC 2021): initial degrees via mxv over the plus-times
ring, then per level k repeatedly peel vertices with degree ≤ k and
subtract the peeled vertices' edge counts from their still-alive
neighbours (the reference's masked mxv "distance" update), until the
level is stable; the level at which a vertex peels is its coreness.

Spark design: one state DataFrame ``(id, deg, core, alive)``; per peel
round one broadcast-friendly join of the (shrinking) peel frontier
against the cached symmetric edge table + one groupBy count — the same
frontier-push shape as the Pregel message exchange. Exactly one driver
action per round (fused peel-count + alive census). State is
localCheckpoint'ed per round to stop lineage growth.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC
from ..operators.blas2 import BROADCAST_NNZ_THRESHOLD


@dataclass
class KCoreResult:
    cores: DataFrame  # (id, core)
    max_k: int
    rounds: int


def kcore_decomposition(
    spark: SparkSession,
    sym_edges: DataFrame,
    n: int,
    max_rounds: int = 0,
    broadcast_threshold: int = BROADCAST_NNZ_THRESHOLD,
) -> KCoreResult:
    """Coreness per vertex over an undirected graph given as a
    symmetric edge table (both directions present, no self-loops)."""
    we_persisted = False
    if not sym_edges.storageLevel.useMemory:
        sym_edges = sym_edges.persist()
        we_persisted = True

    deg = sym_edges.groupBy(F.col(SRC).alias(ID)).agg(F.count("*").alias("deg"))
    state = (
        spark.range(n)
        .select(F.col("id").alias(ID))
        .join(deg, on=ID, how="left")
        .select(
            ID,
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.lit(0).cast("long").alias("core"),
            F.lit(True).alias("alive"),
        )
        .localCheckpoint(eager=True)
    )

    k, rounds = 0, 0
    while True:
        rounds += 1
        peels = F.col("alive") & (F.col("deg") <= k)
        stats = state.agg(
            F.sum(peels.cast("long")).alias("n_peel"),
            F.sum(F.col("alive").cast("long")).alias("n_alive"),
            F.min(F.when(F.col("alive") & ~peels, F.col("deg"))).alias(
                "next_deg"
            ),
        ).collect()[0]
        n_alive = int(stats["n_alive"] or 0)
        n_peel = int(stats["n_peel"] or 0)
        if n_alive == 0:
            break
        if n_peel == 0:
            # level jump: no alive vertex has deg ≤ k, so the next level
            # that peels anything is exactly the minimum alive degree —
            # peel there immediately instead of burning one stats job
            # per empty level (a deep-coreness hub graph has hundreds).
            # n_peel is only the broadcast-choice input below; n_alive
            # upper-bounds it conservatively.
            k = int(stats["next_deg"])
            peels = F.col("alive") & (F.col("deg") <= k)
            n_peel = n_alive
        if max_rounds and rounds > max_rounds:
            break

        # push a unit message along every edge out of a peeled vertex.
        # Frontier size is known (n_peel): broadcast the semi-join only
        # when it fits (the vxm strategy='auto' cost rule) — the k=0/1
        # levels of a web graph can peel a large fraction of all
        # vertices, which must go through the shuffle semi-join instead
        peel_ids = state.where(peels).select(F.col(ID).alias(SRC))
        if n_peel <= broadcast_threshold:
            peel_ids = F.broadcast(peel_ids)
        dec = (
            sym_edges.join(peel_ids, on=SRC, how="left_semi")
            .groupBy(F.col(DST).alias(ID))
            .agg(F.count("*").alias("_dec"))
        )
        state = (
            state.join(dec, on=ID, how="left")
            .select(
                ID,
                F.when(peels, F.col("deg"))
                .otherwise(F.col("deg") - F.coalesce("_dec", F.lit(0)))
                .alias("deg"),
                F.when(peels, F.lit(k).cast("long")).otherwise(F.col("core")).alias("core"),
                (F.col("alive") & ~peels).alias("alive"),
            )
            # lazy: next round's stats agg materializes it (1 job/round)
            .localCheckpoint(eager=False)
        )

    if we_persisted:
        sym_edges.unpersist()
    return KCoreResult(cores=state.select(ID, "core"), max_k=k, rounds=rounds)
