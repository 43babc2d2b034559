"""Single-source shortest paths: min-plus Bellman-Ford to fixpoint.

The reference ships this as its flagship semiring illustration
(examples/sp.cpp:104-107: the ``Semiring<min, add, infinity, zero>``
ring with repeated ``vxm`` hops, shortest_path:57-66) — hop-bounded
there; this module runs it to the fixpoint with convergence detection,
i.e. Bellman-Ford. Per round:

    x' = min(x, (min,+)-vxm of x along edges)

expressed as ONE mxv over B = A ∪ diag(0) (the diagonal carries the
min-plus multiplicative identity 0, so keeping your current distance
is "traverse the self-loop for free" — the add_identity trick of
knn.hpp:129-135 transplanted to the weighted ring). The frontier is
sparse: unreached vertices are structurally absent (distance = the
ring zero, +inf), so early rounds touch only the reached
neighbourhood — the same frontier-proportional shape as the Pregel
runtime. Rounds are bounded by the shortest-path hop radius
(≤ n−1 on any graph without negative cycles).

Scale: each round is one shuffle agg (map-side MIN combine) over the
current frontier's out-edges plus one O(frontier) fixpoint check;
lazy localCheckpoint keeps lineage flat, 1-2 jobs per round.
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
    diag = spark.range(n).select(
        F.col("id").alias(SRC), F.col("id").alias(DST), F.lit(0.0).alias(VAL)
    )
    B = A.select(SRC, DST, F.col(VAL).cast("double")).unionByName(diag)

    x = spark.createDataFrame([(source, 0.0)], vector_schema("double"))
    limit = max_rounds if max_rounds is not None else max(n - 1, 1)
    rounds, converged = 0, False
    while rounds < limit:
        nx = mxv(B, x, alg.MIN_PLUS, transpose=True).localCheckpoint(eager=False)
        rounds += 1
        # exact fixpoint: same support, same values
        changed = (
            nx.join(x.select(ID, F.col(VAL).alias("_old")), on=ID, how="full")
            .where(
                F.col(VAL).isNull()
                | F.col("_old").isNull()
                | (F.col(VAL) != F.col("_old"))
            )
            .count()
        )
        x = nx
        if changed == 0:
            converged = True
            break
    return SsspResult(dists=x, rounds=rounds, converged=converged)
