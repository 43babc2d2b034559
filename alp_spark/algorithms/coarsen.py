"""Graph coarsening: collapse a page-level edge table to a group-level
(host/domain) weighted graph.

The canonical web-graph rollup: map every vertex to a group (pages →
hosts via URL parsing), aggregate parallel edges into one weighted edge
per (group_src, group_dst), and run the iterative algorithms on the
coarse graph.  At 10^12 pages the coarse graph is ~10^7 hosts — small
enough that host-level PageRank converges in seconds once the one
edge-aggregation shuffle has run.  The reference operates on explicit
matrices only; coarsening is the quotient-matrix construction Q^T A Q
(grouping matrix Q) expressed as two joins + one groupBy instead of two
SpGEMMs (reference vocabulary: mxm over the (plus, times) ring,
reference/blas3.hpp:25-63).

Scale notes:
- the two mapping joins shuffle the edge table on src then dst; when the
  group is derivable from the vertex id or the URL string itself (the
  common case — host is a pure function of url), pass ``group_expr``
  instead of ``mapping`` and the rollup is ONE shuffle (the groupBy),
  with no join at all;
- the groupBy(src_group, dst_group) count enjoys map-side partial
  aggregation, so hub-host skew collapses before the exchange, the same
  measured behaviour as the degree aggregation (BASELINE.md skew study).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..containers import DST, ID, SRC, VAL


def coarsen_edges(
    edges: DataFrame,
    mapping: DataFrame | None = None,
    group_expr: Callable[[Column], Column] | None = None,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Collapse ``edges`` (src, dst) to the weighted group graph.

    ``mapping``: (id, group) table — joined onto both endpoints (two
    shuffles of the edge table). ``group_expr``: a function mapping the
    endpoint-id Column to its group Column instead (zero joins — one
    shuffle total). Exactly one of the two must be given.

    Returns (src, dst, val) with val = DOUBLE edge multiplicity, the
    weighted-matrix form :func:`alp_spark.algorithms.simple_pagerank.
    simple_pagerank` auto-detects for weighted rank flow.
    """
    if (mapping is None) == (group_expr is None):
        raise ValueError("pass exactly one of mapping / group_expr")
    if mapping is not None:
        m_src = mapping.select(F.col(ID).alias(SRC), F.col("group").alias("_gs"))
        m_dst = mapping.select(F.col(ID).alias(DST), F.col("group").alias("_gd"))
        grouped = edges.join(m_src, on=SRC).join(m_dst, on=DST)
    else:
        grouped = edges.select(
            group_expr(F.col(SRC)).alias("_gs"),
            group_expr(F.col(DST)).alias("_gd"),
        )
    out = grouped.groupBy(
        F.col("_gs").alias(SRC), F.col("_gd").alias(DST)
    ).agg(F.count("*").cast("double").alias(VAL))
    if drop_self_loops:
        out = out.where(F.col(SRC) != F.col(DST))
    return out
