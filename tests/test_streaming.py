"""Streaming plans vs their batch analogs: the windowed aggregation must
converge to the batch groupBy over the same files; streaming dedup keeps
exactly one row per text hash."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from alp_spark.streaming import (
    hourly_event_counts,
    run_to_memory,
    stream_events,
    streaming_exact_dedup,
)

EV_SCHEMA = "event_id long, event_type string, ts timestamp, value double"


def _events_rows():
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    for i in range(48):
        rows.append(
            (
                i,
                "click" if i % 2 == 0 else "view",
                base + dt.timedelta(minutes=7 * i),
                float(i) / 4.0,
            )
        )
    return rows


@pytest.fixture()
def events_dir(spark, tmp_path):
    path = str(tmp_path / "events")
    df = spark.createDataFrame(_events_rows(), EV_SCHEMA)
    # two files → two chances for the source to split micro-batches
    df.where("event_id < 24").coalesce(1).write.mode("append").parquet(path)
    df.where("event_id >= 24").coalesce(1).write.mode("append").parquet(path)
    return path


def test_streaming_hourly_matches_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    out = run_to_memory(
        hourly_event_counts(stream), spark, "hourly_t", output_mode="complete"
    )
    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("v"),
        )
    )
    want = {
        (r["event_type"], r["hour"]): (r["n"], r["v"]) for r in batch.collect()
    }
    assert got == want
    assert len(want) > 2


def test_streaming_exact_dedup(spark, tmp_path):
    path = str(tmp_path / "docs")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, "the cat sat", base),
        (1, "the cat sat", base + dt.timedelta(minutes=1)),  # dup of 0
        (2, "a different doc", base + dt.timedelta(minutes=2)),
        (3, "the cat sat", base + dt.timedelta(minutes=3)),  # dup again
        (4, "third text", base + dt.timedelta(minutes=4)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)

    stream = stream_events(spark, path)  # generic file stream reader
    out = run_to_memory(streaming_exact_dedup(stream), spark, "dedup_t")
    texts = [r["text"] for r in out.collect()]
    assert sorted(texts) == ["a different doc", "the cat sat", "third text"]


def test_stateful_running_totals_across_microbatches(spark, events_dir):
    # two parquet files + maxFilesPerTrigger=1 => two micro-batches; the
    # applyInPandasWithState fold must carry state across them so the
    # final per-key update equals the full batch totals
    from alp_spark.streaming import running_event_totals

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = run_to_memory(
        running_event_totals(stream), spark, "totals_t", output_mode="update"
    )
    # update mode emits one row per key per batch; counts are monotone,
    # so max(n_events) per key is the final state
    rows = out.groupBy("event_type").agg(
        F.max("n_events").alias("n"), F.max("total_value").alias("v")
    ).collect()
    got = {r["event_type"]: (r["n"], round(r["v"], 6)) for r in rows}
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    want = {r["event_type"]: (r["n"], round(r["v"], 6)) for r in batch.collect()}
    assert got == want
    # and the stream really split into >1 batch: some key was emitted twice
    per_key = out.groupBy("event_type").count().collect()
    assert max(r["count"] for r in per_key) > 1


def test_sessionize_batch_matches_python(spark):
    import datetime as dt

    from alp_spark.pipeline import sessionize

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: two sessions (31-minute gap between events 2 and 3)
        (0, m(0), 1, 1.0), (1, m(10), 1, 2.0), (2, m(20), 1, 3.0),
        (3, m(51), 1, 4.0), (4, m(60), 1, 5.0),
        # user 2: one session, events exactly gap-distance apart (30min
        # gap is NOT a boundary: boundary needs gap > 30min)
        (5, m(0), 2, 1.5), (6, m(30), 2, 2.5), (7, m(60), 2, 3.5),
        # user 3: single event
        (8, m(5), 3, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"], r["total_value"]
        )
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {
        (1, 1): (m(0), m(20), 3, 6.0),
        (1, 2): (m(51), m(60), 2, 9.0),
        (2, 1): (m(0), m(60), 3, 7.5),
        (3, 1): (m(5), m(5), 1, 9.0),
    }


def test_streaming_sessionize_closed_sessions_match_batch(spark, tmp_path):
    import datetime as dt

    from alp_spark.pipeline import sessionize, streaming_sessionize

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        (0, m(0), 1, 1.0), (1, m(10), 1, 2.0),
        (2, m(55), 1, 3.0),  # closes session 1 of user 1
        (3, m(120), 1, 4.0),  # closes session 2
        (4, m(0), 2, 1.5), (5, m(45), 2, 2.5),  # closes session 1 of user 2
    ]
    schema = "event_id long, ts timestamp_ntz, user_id long, value double"
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "sess_events")
    # two files split mid-stream: state must carry open sessions across
    # micro-batches
    df.where("event_id < 3").coalesce(1).write.mode("append").parquet(path)
    df.where("event_id >= 3").coalesce(1).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_to_memory(
        streaming_sessionize(stream, gap_minutes=30), spark, "sess_t"
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    batch = sessionize(df, gap_minutes=30)
    # streaming emits a session only when a later event closes it; each
    # user's LAST batch session stays open in state
    w_last = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    last = {u: max(s for (uu, s) in w_last if uu == u) for u, _ in w_last}
    want = {k: v for k, v in w_last.items() if k[1] != last[k[0]]}
    assert got == want
    assert got  # at least one closed session was actually emitted


def _write_batches(spark, path, schema, batches):
    """Write each row-list as its own parquet file, spaced in mtime so
    maxFilesPerTrigger=1 replays them as ordered micro-batches."""
    import time

    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(0.05)


def test_streaming_sessionize_event_time_timeout(spark, tmp_path):
    # VERDICT r3 item 8: with event_time_timeout, a session is emitted
    # once the watermark passes session_end + gap (no on-time event can
    # extend it), and — the ADVICE r3 fix — the per-user sid counter
    # survives the flush so the next session numbers monotonically.
    import datetime as dt

    from alp_spark.pipeline import streaming_sessionize

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
    schema = "event_id long, ts timestamp, user_id long, value double"
    path = str(tmp_path / "sess_et")
    _write_batches(
        spark,
        path,
        schema,
        [
            [(0, m(0), 1, 1.0), (1, m(10), 1, 2.0)],  # user 1 session 1
            [(2, m(600), 2, 9.0)],  # advances watermark -> flush (1,1)
            [(3, m(700), 1, 4.0)],  # user 1 session 2 opens
            [(4, m(800), 1, 5.0)],  # gap>30 closes session 2 by event
        ],
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .withWatermark("ts", "0 seconds")
    )
    out = run_to_memory(
        streaming_sessionize(stream, gap_minutes=30, event_time_timeout=True),
        spark,
        "sess_et_t",
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["session_start"], r["session_end"], r["n_events"]
        )
        for r in out.collect()
    }
    # (1,1) flushed by the event-time timer; (1,2) — NOT a second (1,1)
    # — closed by the gap event; (2,1) flushed once wm reached 630.
    assert got[(1, 1)] == (m(0), m(10), 2)
    assert got[(1, 2)] == (m(700), m(700), 1)
    assert got[(2, 1)] == (m(600), m(600), 1)
    # session 3 (m(800)) is still open: watermark never passed 830
    assert (1, 3) not in got


def test_streaming_sessionize_late_event_keeps_session_end(spark, tmp_path):
    # ADVICE r3: a late event landing inside the open session in a later
    # micro-batch must not drag session_end backwards; bounds extend
    # monotonically (st=min, en=max).
    import datetime as dt

    from alp_spark.pipeline import streaming_sessionize

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
    schema = "event_id long, ts timestamp_ntz, user_id long, value double"
    path = str(tmp_path / "sess_late")
    _write_batches(
        spark,
        path,
        schema,
        [
            [(0, m(0), 1, 1.0), (1, m(20), 1, 2.0)],
            # m(10) arrives late (inside the open session), then m(60)
            # closes it; the gap check must use en=20, and the emitted
            # session_end must be m(20), not the stale m(10)
            [(2, m(10), 1, 3.0), (3, m(60), 1, 4.0)],
        ],
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_to_memory(
        streaming_sessionize(stream, gap_minutes=30), spark, "sess_late_t"
    )
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["session_id"]) == (1, 1)
    assert r["session_start"] == m(0)
    assert r["session_end"] == m(20)
    assert r["n_events"] == 3
