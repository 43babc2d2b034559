"""Maximal independent set via deterministic-priority Luby rounds.

The classic distributed symmetry-breaking primitive (Luby 1986, "A
Simple Parallel Algorithm for the Maximal Independent Set Problem"), in
the GraphBLAS formulation the reference's vocabulary expresses
directly (the GraphBLAS C API spec ships MIS as its Algorithm 1
example): per round, an undecided vertex joins the MIS iff its priority
beats the minimum priority over its undecided neighbours — an mxv under
the (min, second) ring (base/blas2.hpp:1188 semantics) followed by an
eWiseApply less-than mask — then winners and their neighbourhoods leave
the undecided set (two masked assigns).

Priorities here are a fixed multiplicative hash of the vertex id
(Knuth's 2654435761, odd ⇒ bijective mod 2^32 ⇒ all priorities
DISTINCT), so the run is fully deterministic and SQL-unrollable while
keeping Luby's O(log n) expected round count on hashed (effectively
random) orderings. Strict ``<`` needs no tie-break: two adjacent
vertices can never both win a round (the loser sees the winner's
smaller priority in its neighbourhood minimum).

Scale shape: the symmetric edge table is hash-partitioned by dst once
and persisted (the FastSV layout); each round shuffles only the
undecided frontier — whose size HALVES in expectation every round (half
the EDGES die per Luby round) — and the state vector is
localCheckpoint'ed lazily with exactly ONE driver action (the undecided
census) per round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC
from ..plans.partitions import cache_sized, range_partitions

#: Knuth multiplicative hash constant; odd → bijective mod 2^32.
PRIO_MULT = 2654435761
PRIO_MOD = 2**32

#: state-vector codes
UNDECIDED, IN_MIS, OUT = 0, 1, 2


def priority_col(id_col: Column) -> Column:
    """Deterministic distinct priority of a vertex id (BIGINT math —
    ids up to 2^31 stay far below 2^63 overflow)."""
    return (id_col * F.lit(PRIO_MULT)) % F.lit(PRIO_MOD)


@dataclass
class MISResult:
    members: DataFrame  # (id,) — the maximal independent set
    rounds: int


def maximal_independent_set(
    spark: SparkSession,
    sym_edges: DataFrame,
    n: int,
    max_rounds: int = 0,
) -> MISResult:
    """Exact MIS of the undirected graph given as a symmetric edge
    table (both directions present, no self-loops) over vertices
    0..n-1. Vertices with no neighbours enter the set in round 1.

    The result is the unique greedy MIS under the priority order —
    independent (no edge inside), maximal (every outside vertex has a
    member neighbour), and identical across partitionings/cluster
    sizes because priorities are a pure function of the id."""
    # size-derived layout (guide §2): the loop re-scans E and st every
    # round, so empty-task overhead compounds per round; partition
    # counts follow the measured row counts, capped at the conf value
    # (identical layout to before at scale).
    E, _ = cache_sized(spark, sym_edges.select(SRC, DST), key=DST)

    st = spark.range(0, n, 1, range_partitions(spark, n)).select(
        F.col("id").alias(ID),
        priority_col(F.col("id")).alias("_p"),
        F.lit(UNDECIDED).alias("_st"),
    ).localCheckpoint(eager=True)

    # driver-known state size gates STATIC broadcast plans for the
    # per-round joins against the ≤ n-row state slices (no AQE
    # both-sides materialization barrier — the hits5 measurement)
    from ..operators.blas2 import BROADCAST_NNZ_THRESHOLD

    small = n <= BROADCAST_NNZ_THRESHOLD

    def _hint(side: DataFrame) -> DataFrame:
        return F.broadcast(side) if small else side

    rounds = 0
    while True:
        und = st.where(F.col("_st") == UNDECIDED)
        # min undecided-neighbour priority per undecided vertex:
        # (min, second) mxv masked to the undecided set on both sides
        mn = (
            E.join(
                _hint(und.select(F.col(ID).alias(DST), F.col("_p").alias("_np"))),
                on=DST,
            )
            .join(_hint(und.select(F.col(ID).alias(SRC))), on=SRC, how="left_semi")
            .groupBy(SRC)
            .agg(F.min("_np").alias("_mn"))
            .select(F.col(SRC).alias(ID), "_mn")
        )
        winners = (
            und.join(mn, on=ID, how="left")
            .where(F.col("_mn").isNull() | (F.col("_p") < F.col("_mn")))
            .select(ID)
        )
        nbrs = (
            E.join(
                _hint(winners.select(F.col(ID).alias(SRC))), on=SRC, how="left_semi"
            )
            .select(F.col(DST).alias(ID))
            .distinct()
        )
        nxt = (
            st.join(winners.select(ID, F.lit(True).alias("_w")), on=ID, how="left")
            .join(nbrs.select(ID, F.lit(True).alias("_nb")), on=ID, how="left")
            .select(
                ID,
                "_p",
                F.when(F.col("_st") != UNDECIDED, F.col("_st"))
                .when(F.col("_w"), F.lit(IN_MIS))
                .when(F.col("_nb"), F.lit(OUT))
                .otherwise(F.lit(UNDECIDED))
                .alias("_st"),
            )
        )
        # lazy: the census below materializes the checkpoint — one job
        nxt = nxt.localCheckpoint(eager=False)
        remaining = nxt.where(F.col("_st") == UNDECIDED).count()
        st = nxt
        rounds += 1
        if remaining == 0 or (max_rounds and rounds >= max_rounds):
            break

    E.unpersist()
    return MISResult(members=st.where(F.col("_st") == IN_MIS).select(ID), rounds=rounds)
