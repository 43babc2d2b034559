"""Single-source shortest paths: min-plus Bellman-Ford to fixpoint.

The reference ships this as its flagship semiring illustration
(examples/sp.cpp:104-107: the ``Semiring<min, add, infinity, zero>``
ring with repeated ``vxm`` hops, shortest_path:57-66) — hop-bounded
there; this module runs it to the fixpoint with convergence detection,
i.e. Bellman-Ford. Per round:

    x' = min(x, (min,+)-vxm of x along edges)

with the min fold against the running distance vector playing the
role of the diag(0) self-loop (the add_identity trick of
knn.hpp:129-135). The relaxation frontier is the DELTA frontier:
only out-edges of vertices whose distance CHANGED last round are
relaxed (the queue-based Bellman-Ford refinement) — exact, because a
vertex that did not change contributed the same values in the round
after it last changed and min is idempotent. Per-round support,
values, and total round count are identical to full re-relaxation;
per-round COST tracks |changed|'s out-edges instead of |reached|'s,
which is the difference between wavefront-proportional and
corpus-proportional once the reached set saturates. The driver-known
census feeds ``mxv(frontier_nnz=...)`` so a small frontier broadcasts
(zero edge movement). Rounds are bounded by the shortest-path hop
radius (≤ n−1 on any graph without negative cycles).

Scale: each round is one shuffle agg (map-side MIN combine) over the
changed frontier's out-edges plus one O(frontier) census action;
lazy localCheckpoint keeps lineage flat.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import algebra as alg
from ..containers import DST, ID, SRC, VAL, vector_schema
from ..operators import mxv


@dataclass
class SsspResult:
    dists: DataFrame  # (id, val) — reachable vertices only (sparse)
    rounds: int
    converged: bool


def sssp(
    spark: SparkSession,
    A: DataFrame,
    n: int,
    source: int,
    max_rounds: int | None = None,
) -> SsspResult:
    """Shortest distances from ``source`` over weighted edges
    (src, dst, val); ``val`` must be non-negative (Bellman-Ford with
    min-plus converges in ≤ n−1 rounds then; the fixpoint test is
    exact equality of consecutive distance vectors)."""
    if not 0 <= source < n:
        raise ValueError("source out of range (reference MISMATCH)")
    if VAL not in A.columns:
        # pattern matrix: every edge costs the ring one (0.0) — mirrors
        # mpv3's pattern-ring convention
        A = A.withColumn(VAL, F.lit(0.0))
    B = A.select(SRC, DST, F.col(VAL).cast("double")).persist()

    x = spark.createDataFrame([(source, 0.0)], vector_schema("double"))
    changed = x
    nch = 1
    inf = F.lit(float("inf"))
    limit = max_rounds if max_rounds is not None else max(n - 1, 1)
    rounds, converged = 0, False
    while rounds < limit:
        relax = mxv(
            B, changed, alg.MIN_PLUS, transpose=True, frontier_nnz=nch
        )
        rounds += 1
        merged = (
            x.select(ID, F.col(VAL).alias("_old"))
            .join(relax.select(ID, F.col(VAL).alias("_new")), on=ID, how="full")
            .select(
                ID,
                F.least(
                    F.coalesce("_old", inf), F.coalesce("_new", inf)
                ).alias(VAL),
                (
                    F.col("_old").isNull()
                    | (F.coalesce("_new", inf) < F.col("_old"))
                ).alias("_ch"),
            )
            .localCheckpoint(eager=False)
        )
        nch = merged.where("_ch").count()
        changed = merged.where("_ch").select(ID, VAL)
        x = merged.select(ID, VAL)
        if nch == 0:
            converged = True
            break
    B.unpersist()
    return SsspResult(dists=x, rounds=rounds, converged=converged)
