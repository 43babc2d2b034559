"""Contiguous vertex-id assignment url → [0, n).

The reference Pregel constructor requires contiguous ids 0..n-1
(interfaces/pregel.hpp:474-477). ``monotonically_increasing_id`` is NOT
contiguous, and a global window (row_number over one partition) would
serialise the whole dictionary through one task — wrong at 10^12 rows.
``zipWithIndex`` computes per-partition offsets with one lightweight
count job and no extra shuffle beyond the dedup: the scalable idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_contiguous_ids(urls: DataFrame, col: str = "url") -> DataFrame:
    """Distinct values of ``col`` → DataFrame (url, id) with ids exactly
    0..n-1. Deterministic given a deterministic input ordering: we sort
    within the dedup shuffle so the mapping is stable across runs."""
    spark = urls.sparkSession
    distinct = urls.select(col).distinct().repartition(F.col(col)).sortWithinPartitions(col)
    schema = T.StructType(
        [
            T.StructField(col, distinct.schema[col].dataType, False),
            T.StructField("id", T.LongType(), False),
        ]
    )
    indexed = distinct.rdd.map(lambda r: r[0]).zipWithIndex()
    return spark.createDataFrame(indexed, schema)
