"""Link prediction over the symmetrised graph: common-neighbour scores.

Composed from the engine's wedge machinery (the triangle-count join
shape, base/blas3.hpp:94 vocabulary): for every non-adjacent pair
(u, v) reachable in two hops, score the likelihood of a future edge by

- ``common``       — |Γ(u) ∩ Γ(v)| (common-neighbour count),
- ``jaccard``      — common / |Γ(u) ∪ Γ(v)|,
- ``adamic_adar``  — Σ_{w ∈ Γ(u)∩Γ(v)} 1 / ln(deg w)  (Adamic-Adar).

Wedges are enumerated at their CENTRE w (pairs of w's neighbours with
u < v), so per-vertex work is Σ deg(w)² — the classic hub hazard. At
scale, ``max_center_degree`` caps it: hubs above the cap are skipped as
centres, the standard production mitigation (a hub shared by millions
of pairs carries ~zero Adamic-Adar signal anyway: 1/ln(deg) → 0). The
cap trades recall for a hard work bound and is exact when None.

Scale shape: one self-join on the centre + one groupBy on the pair
(map-side combine) + one anti-join against the edge set + one broadcast
-able degree join. No driver loops, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..containers import SRC, DST


def link_prediction_scores(
    sym_edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Score non-adjacent two-hop pairs on an UNDIRECTED graph given as
    a both-direction edge table (u→v and v→u both present, no
    self-loops, no duplicates).

    Returns ``(u, v, common, jaccard, adamic_adar)`` with u < v, one row
    per pair with at least ``min_common`` common neighbours (counted
    over centres within the degree cap).
    """
    deg = sym_edges.groupBy(SRC).agg(F.count("*").alias("_d"))

    # neighbour lists keyed by centre w = src, with w's degree attached
    nbrs = sym_edges.join(deg, on=SRC)
    if max_center_degree is not None:
        nbrs = nbrs.where(F.col("_d") <= max_center_degree)

    left = nbrs.select(
        F.col(SRC).alias("w"), F.col(DST).alias("u"), F.col("_d").alias("_dw")
    )
    right = nbrs.select(F.col(SRC).alias("w"), F.col(DST).alias("v"))
    pairs = (
        left.join(right, on="w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("common"),
            F.sum(1.0 / F.log(F.col("_dw"))).alias("adamic_adar"),
        )
        .where(F.col("common") >= min_common)
        # non-adjacent pairs only: drop wedge endpoints that are edges
        .join(
            sym_edges.select(F.col(SRC).alias("u"), F.col(DST).alias("v")),
            on=["u", "v"],
            how="left_anti",
        )
    )
    du = deg.select(F.col(SRC).alias("u"), F.col("_d").alias("_du"))
    dv = deg.select(F.col(SRC).alias("v"), F.col("_d").alias("_dv"))
    return (
        pairs.join(du, on="u")
        .join(dv, on="v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common")
                / (F.col("_du") + F.col("_dv") - F.col("common"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
