"""k-truss decomposition (fixed k): the edge-centric cohesion kernel.

The k-truss of an undirected graph is the maximal subgraph in which
every edge lies in at least k−2 triangles *of the subgraph* (Cohen
2008, public). The fixpoint loop mirrors k-core but peels EDGES by
triangle support instead of vertices by degree:

    repeat:  sup(u,v) = |N(u) ∩ N(v)| within the surviving edge set
             drop every edge with sup < k−2
    until no edge dropped

Each support pass is the triangle wedge join (the triangle_count
machinery: one self-join on the shared endpoint + one edge-set
semi-join shape), so per-round cost is triangle-enumeration work over
the SHRINKING edge set — rounds are bounded by the peel depth, which
on web graphs is small (dense cores stabilise fast; sparse tendrils
die in round 1 because a triangle-free edge has support 0).

Scale shape: the support join is the engine's standard wedge shuffle
with map-side combine on the (u, v) support aggregation; the surviving
edge set is re-persisted once per round and the census is ONE action
per round. Exact — no sampling; the loop is a monotone peel, so
unrolling extra rounds past the fixpoint is a no-op (the SQL oracle's
safety property).
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
    m = E.count()
    rounds = 0
    while True:
        # support via ORIENTED triangle enumeration (the triangle_count
        # trick): orient each edge from its (degree, id)-smaller
        # endpoint, enumerate each surviving triangle exactly once with
        # an inner wedge join bounded by O(arboricity·deg) per vertex
        # (no deg² hub blowup — the naive per-edge common-neighbour
        # join OOMs an 8g heap on the dense sf0.01 fixture), then
        # scatter one support unit to each of the triangle's 3 edges.
        deg = (
            E.select(F.col(SRC).alias("x"))
            .unionAll(E.select(F.col(DST).alias("x")))
            .groupBy("x")
            .agg(F.count("*").alias("_d"))
        )
        o = (
            E.join(deg.select(F.col("x").alias(SRC), F.col("_d").alias("_du")), on=SRC)
            .join(deg.select(F.col("x").alias(DST), F.col("_d").alias("_dv")), on=DST)
            .select(
                F.when(
                    (F.col("_du") < F.col("_dv"))
                    | ((F.col("_du") == F.col("_dv")) & (F.col(SRC) < F.col(DST))),
                    F.col(SRC),
                )
                .otherwise(F.col(DST))
                .alias("a"),
                F.when(
                    (F.col("_du") < F.col("_dv"))
                    | ((F.col("_du") == F.col("_dv")) & (F.col(SRC) < F.col(DST))),
                    F.col(DST),
                )
                .otherwise(F.col(SRC))
                .alias("b"),
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
        # localCheckpoint, not persist: each round's plan nests ~10
        # copies of the previous round's (deg union + 3 o-joins + the
        # scatter union), so an un-truncated logical plan grows
        # exponentially and OOMs the driver during ANALYSIS by round
        # ~9 — the checkpoint truncates the plan as well as the lineage
        nxt = (
            sup.groupBy(SRC, DST)
            .agg(F.count("*").alias("_sup"))
            .where(F.col("_sup") >= need)
            .select(SRC, DST)
            .localCheckpoint(eager=True)
        )
        m2 = nxt.count()
        rounds += 1
        E.unpersist()
        E = nxt
        if m2 == m or (max_rounds and rounds >= max_rounds):
            break
        m = m2
    return TrussResult(edges=E, rounds=rounds)
