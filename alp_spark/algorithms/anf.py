"""Approximate neighbourhood function via Flajolet-Martin bit-OR
propagation (ANF: Palmer, Gibbons, Faloutsos, KDD 2002 — the
HyperBall/HADI family's ancestor).

Each vertex starts with a one-bit FM sketch — bit ρ(h(v)) set, where
ρ is the position of the lowest set bit of a fixed multiplicative hash
(geometrically distributed) — and K rounds of

    S_{k+1}(v) = S_k(v)  |  OR over out-edges (v,u) of S_k(u)

leave S_K(v) sketching |ball_out(v, K)|: the OR of FM sketches of a set
IS the FM sketch of the set, so after k rounds each vertex holds the
sketch of everything within k hops. The estimate is the classic
2^(lowest zero bit) / 0.77351.

This is the (bit_or, left_assign) semiring over the pattern matrix —
mxv under a user monoid, exactly the reference's generalised-ring vxm
vocabulary (base/blas2.hpp:307) with ⊕ = bitwise OR — and the "novel
sketch" operator class the engine exposes for web-scale radius/
diameter estimation where exact k-hop sets are quadratically large.

Scale shape: identical to the PageRank/FastSV loop — the edge table is
hash-partitioned by dst once and persisted, each round is one join +
one map-side-combined bit_or aggregation (8 bytes/vertex of state, the
cheapest state vector in the engine), and rounds are FIXED at K (no
convergence action needed; one lazy checkpoint per round).

Determinism: the hash is a pure function of the vertex id, bit-OR is
commutative/associative/idempotent — results are exact-identical
across partitionings and cluster sizes, and the DuckDB oracle unrolls
the same arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC
from ..plans.partitions import cache_sized, range_partitions
from .mis import PRIO_MOD, PRIO_MULT

#: golden-ratio salt so h(0) ≠ 0 for almost all ids (h == 0 is still
#: guarded: it maps to the 2^32 "impossibly rare" bit).
HASH_SALT = 2654435769

#: Flajolet-Martin bias correction.
FM_PHI = 0.77351


def fm_init_col(id_col: Column) -> Column:
    """One-bit FM sketch of a vertex id: ``h & -h`` (the lowest set
    bit's VALUE, i.e. 2^ρ(h)) of the salted multiplicative hash."""
    h = (id_col * F.lit(PRIO_MULT) + F.lit(HASH_SALT)) % F.lit(PRIO_MOD)
    return F.when(h == 0, F.lit(PRIO_MOD)).otherwise(
        h.bitwiseAND(-h)
    )


def fm_lowzero_col(sketch: Column) -> Column:
    """Value of the sketch's lowest ZERO bit (2^R) — an exact BIGINT."""
    return F.bitwise_not(sketch).bitwiseAND(sketch + F.lit(1))


def fm_estimate_col(sketch: Column) -> Column:
    """FM cardinality estimate: value of the lowest ZERO bit / φ."""
    return fm_lowzero_col(sketch).cast("double") / F.lit(FM_PHI)


@dataclass
class ANFResult:
    sketches: DataFrame  # (id, sketch, est_reach)
    rounds: int


def neighborhood_function(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    rounds: int = 4,
) -> DataFrame:
    """The ANF proper: N(h) = estimated number of (source, reachable)
    pairs within h hops, for h = 1..rounds — the curve whose 90%
    saturation point is the web graph's EFFECTIVE DIAMETER (Palmer et
    al. KDD 2002 §4; the Kronecker/graph-500 evaluation statistic).

    One propagation pass: after each bit-OR round the per-vertex FM
    estimates are summed into a 1-row frame; the per-hop frames union
    into the (hop, n_pairs) result and the whole computation stays ONE
    lazy plan — no per-round action (the one-job pattern)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    # size-derived cached layout (guide §2; conf-capped, so identical
    # at scale) — one E scan per hop.
    E, _ = cache_sized(spark, edges.select(SRC, DST), key=DST)

    s = spark.range(0, n, 1, range_partitions(spark, n)).select(
        F.col("id").alias(ID), fm_init_col(F.col("id")).alias("_s")
    )
    small = n <= 1_000_000  # static broadcast gate (blas2 threshold)
    hops = []
    for h in range(1, rounds + 1):
        pull_side = s.select(F.col(ID).alias(DST), F.col("_s").alias("_x"))
        pulled = (
            E.join(F.broadcast(pull_side) if small else pull_side, on=DST)
            .groupBy(SRC)
            .agg(F.bit_or("_x").alias("_o"))
            .select(F.col(SRC).alias(ID), "_o")
        )
        s = (
            s.join(pulled, on=ID, how="left")
            .select(
                ID,
                F.col("_s").bitwiseOR(F.coalesce("_o", F.lit(0))).alias("_s"),
            )
            .localCheckpoint(eager=False)
        )
        # sum the EXACT integer 2^R values and divide by φ once: a
        # float sum is partition-order-sensitive at round(6) precision,
        # an integer sum is bit-identical in any order and any engine
        hops.append(
            s.agg(F.sum(fm_lowzero_col(F.col("_s"))).alias("_z")).select(
                F.lit(h).cast("long").alias("hop"),
                F.round(F.col("_z").cast("double") / F.lit(FM_PHI), 6).alias(
                    "n_pairs"
                ),
            )
        )
    out = hops[0]
    for f in hops[1:]:
        out = out.unionByName(f)
    out = out.localCheckpoint(eager=True)  # one action for the chain
    E.unpersist()
    return out


def anf(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    rounds: int = 3,
) -> ANFResult:
    """K-round out-ball FM sketches for vertices 0..n-1 over the
    directed edge table. ``est_reach`` includes the vertex itself."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    # same size-derived layout as neighborhood_function above
    E, _ = cache_sized(spark, edges.select(SRC, DST), key=DST)

    s = spark.range(0, n, 1, range_partitions(spark, n)).select(
        F.col("id").alias(ID), fm_init_col(F.col("id")).alias("_s")
    )

    small = n <= 1_000_000  # static broadcast gate (blas2 threshold)
    for _ in range(rounds):
        pull_side = s.select(F.col(ID).alias(DST), F.col("_s").alias("_x"))
        pulled = (
            E.join(F.broadcast(pull_side) if small else pull_side, on=DST)
            .groupBy(SRC)
            .agg(F.bit_or("_x").alias("_o"))
            .select(F.col(SRC).alias(ID), "_o")
        )
        s = (
            s.join(pulled, on=ID, how="left")
            .select(
                ID,
                F.col("_s").bitwiseOR(F.coalesce("_o", F.lit(0))).alias("_s"),
            )
            # lazy: no per-round action — the caller's single
            # materialisation runs the whole pinned-round chain as one
            # job, each checkpoint truncating lineage as it fills
            .localCheckpoint(eager=False)
        )

    # ONE action for the whole run (fills every lazy checkpoint), then
    # the edge cache can go; later reads serve from the final state
    s.count()
    E.unpersist()
    out = s.select(
        ID,
        F.col("_s").alias("sketch"),
        F.round(fm_estimate_col(F.col("_s")), 6).alias("est_reach"),
    )
    return ANFResult(sketches=out, rounds=rounds)
