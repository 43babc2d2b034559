"""Structured Streaming surfaces: the engine's batch aggregations and
dedup re-expressed as incremental, watermarked streaming plans.

The reference (ALP) is a batch engine; these exist because the target
deployment (a continuously-crawled Common-Crawl-style corpus) ingests
pages as a stream. Design rules match the batch engine: declarative
plans, built-in functions only, watermarks bound state so a year-long
stream cannot accumulate unbounded aggregation state.

Scale notes: the windowed aggregation shuffles on (event_type, window) —
map-side partial aggregation applies exactly as in the batch groupBy;
the streaming dedup keeps one state row per key within the watermark
horizon (RocksDB state store on a real cluster). Late rows beyond the
watermark are dropped, which is the documented trade for bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """File-source event stream (new parquet files under ``path`` become
    micro-batches). Schema is required by streaming sources; read it
    from the existing files when not given."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming mirror of the batch ``events_hourly`` query: tumbling
    1-hour windows per event_type with a watermark bounding state.

    Returns (event_type, hour, n_events, total_value) — the same schema
    and values as the batch groupBy once every input file is processed.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("hour"),
            "n_events",
            "total_value",
        )
    )


def streaming_exact_dedup(
    docs: DataFrame, ts_col: str = "ts", watermark: str = "24 hours"
) -> DataFrame:
    """Streaming exact dedup: keep the first document per text hash seen
    within the watermark horizon (``dropDuplicates`` keyed on the md5 —
    one state-store row per distinct text, evicted past the watermark).
    The batch analog is ``pipeline.exact_dedup``'s keep-first-id group.
    """
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def run_to_memory(
    stream: DataFrame,
    spark: SparkSession,
    name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all currently-available input (Trigger.AvailableNow) into
    an in-memory table and return it — the test/driver harness for the
    streaming plans; production sinks swap in parquet/Kafka unchanged."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
