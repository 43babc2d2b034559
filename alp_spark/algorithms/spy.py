"""Matrix spy: block-density summary of a huge sparse matrix.

Transliterates include/graphblas/algorithms/spy.hpp (spy:195-226 and
internal::spy_from_bool_or_void_input:47-131): every nonzero (i, j) of
the m×n pattern matrix maps into a cell of a small_m×small_n summary
matrix and the cells count how many nonzeroes landed in them;
``normalize=True`` stores 1/count instead (spy.hpp:123-128). The cell
index reproduces the reference's arithmetic exactly —
``size_t(double(i) / (m / small_m))`` (spy.hpp:63-67/84-88) — as a
float64 division + floor, so block boundaries agree bit-for-bit.

Where the reference computes this as P·A·Q with assign-and-add
semirings over replicated small matrices (spy.hpp:100-121 — a 6-call
mxm pipeline because GraphBLAS has no groupBy), the Spark-first plan is
ONE map-side-combinable groupBy over the block keys: the natural
physical form of the same ⊕-aggregation, with O(small_m·small_n)
result cells. The reference's structural-set preprocessing
(spy.hpp:219-223, dropping duplicate/explicit-zero distinctions) is the
``distinct()`` on the (i, j) pattern.

Scale: one shuffle of small_m·small_n·P partial cells after map-side
aggregation; the nnz scan never leaves its partitions. This is the
routine "what does the adjacency structure look like" probe for a
100 TB edge table — a density heatmap at any resolution for the cost
of one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..containers import DST, SRC


def spy(
    edges: DataFrame,
    m: int,
    n: int,
    small_m: int,
    small_n: int,
    normalize: bool = False,
) -> DataFrame:
    """Block nnz counts: (row_blk, col_blk, count) — or (row_blk,
    col_blk, val=1/count) when ``normalize`` (spy.hpp:123-128).

    Raises ValueError when the summary is larger than the input
    (reference ILLEGAL, spy.hpp:215-216). When the sizes match, the
    summary IS the pattern with every value 1 (spy.hpp:217-218).
    """
    if small_m > m or small_n > n:
        raise ValueError(
            "summary dims must not exceed input dims (reference ILLEGAL)"
        )
    pattern = edges.select(SRC, DST).distinct()
    if small_m == m and small_n == n:  # structural set shortcut
        one = F.lit(1.0 if normalize else 1).alias(
            "val" if normalize else "count"
        )
        return pattern.select(
            F.col(SRC).alias("row_blk"), F.col(DST).alias("col_blk"), one
        )
    # the reference maps index i to size_t(double(i) / (m / small_m)):
    # float64 divide then truncate — mirrored exactly so boundary rows
    # land in the same block in every engine
    row_blk = F.floor(
        F.col(SRC).cast("double") / F.lit(m / small_m)
    ).cast("long").alias("row_blk")
    col_blk = F.floor(
        F.col(DST).cast("double") / F.lit(n / small_n)
    ).cast("long").alias("col_blk")
    counts = pattern.groupBy(row_blk, col_blk).agg(F.count("*").alias("count"))
    if normalize:
        return counts.select(
            "row_blk", "col_blk", (F.lit(1.0) / F.col("count")).alias("val")
        )
    return counts
