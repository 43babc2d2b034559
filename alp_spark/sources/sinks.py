"""Bucketed edge-table sink: pay the partitioning shuffle once, at
write time.

At the 10^12-document design point the edge table is read by every
algorithm run, and each run's first shuffle (hash-partition by src or
dst) costs more than the compute that follows. Bucketing moves that
shuffle to ingest: ``bucketBy(n_buckets, key)`` hashes rows to bucket
files at write, and every later equi-join or aggregation on the bucket
key is planned WITHOUT an Exchange (pytest-asserted) — the DataFrame
analog of ALP ingesting the matrix once into its partitioned CRS/CCS
form (reference/matrix.hpp:912, the buildMatrixUnique one-time ingest).

Choose n_buckets ≈ the cluster's total core count at the target scale
(buckets are the parallelism floor for bucket-local stages) and the
bucket key to match the dominant join side: dst for pull-style
aggregation (PageRank), src for push/scatter. Two tables bucketed the
same way co-locate, so iterating algorithms can join state against
edges shuffle-free every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..containers import SRC


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str = SRC,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table. Sorting within buckets additionally enables
    sort-merge joins without a per-read sort."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a
    plain ``spark.read.parquet`` of the files would LOSE the bucketing
    and reintroduce the shuffle)."""
    return spark.table(table)
