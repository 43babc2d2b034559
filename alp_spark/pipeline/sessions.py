"""Gap-based sessionization of an event stream — batch and streaming.

The canonical stateful event-pipeline operator: events of one user
belong to the same session while consecutive gaps stay ≤ ``gap``
(microsecond integer arithmetic end-to-end, so engines agree exactly).

Batch form: one window pass per user ordered by time — lag to flag
session starts, a running sum to number sessions, one groupBy for the
rollup. Scale shape: a single shuffle on user_id (the window and the
rollup share it), skew bounded by the busiest user's event count.

Streaming form: ``applyInPandasWithState`` keyed by user_id carrying
(session start, last ts, count, value sum) — emits a session when the
watermark-driven processing-time timeout fires or a gap-exceeding
event arrives. The batch twin is the oracle: on fully-arrived data the
streaming operator must emit identical sessions (pytest-asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id long, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, total_value double"
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events,
    total_value): maximal runs of one user's events with inter-event
    gaps ≤ ``gap_minutes``. session_id numbers a user's sessions from
    1 in time order."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events carry TIMESTAMP_NTZ; the session runs in UTC
    # (alp_spark.session), so the cast to TIMESTAMP is offset-free and
    # unix_micros agrees with DuckDB's epoch_us on the naive value
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select("user_id", "event_id", "ts", "value")
        .withColumn("session_id", sess.cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def streaming_sessionize(
    events: DataFrame, gap_minutes: int = 30,
    timeout_minutes: int | None = None,
    event_time_timeout: bool = False,
):
    """Streaming twin over a streaming DataFrame: per-user state folds
    events into the open session; a gap-exceeding event closes and
    emits the previous session.

    Timer modes (both retain the per-user ``sid`` counter across a
    flush, so session numbering stays monotone from 1 in time order):

    - ``timeout_minutes`` set: a processing-time timer flushes idle
      users' open sessions — use on a continuously-running query.
    - ``event_time_timeout=True``: an event-time timer fires once the
      watermark passes ``session_end + gap`` — at that point no
      on-time event can extend the session, so the emitted prefix
      matches the batch oracle on closed sessions for late data
      admitted by a watermark delay ≤ gap. Admitted strays even
      earlier than that (delay > gap) are sessionized separately
      before the open session with correct relative numbering
      (ADVICE r4); only a stray predating an *already-emitted*
      session — unreachable when delay ≤ gap — can still disagree
      with batch numbering. Requires ``events`` to carry a
      watermark on ``ts`` (``events.withWatermark("ts", ...)``).

    Default is NO timer: open sessions wait for their closing event,
    which is also what lets a drain-style run (Trigger.AvailableNow)
    terminate — a pending timer keeps an availableNow query alive
    until it fires. Emitted (closed) sessions match :func:`sessionize`
    on fully-arrived data; cross-batch disorder inside a still-open
    session is absorbed via ``st=min``/``en=max`` rather than
    corrupting subsequent gap checks."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if timeout_minutes is not None and event_time_timeout:
        raise ValueError(
            "choose either timeout_minutes (processing-time) or "
            "event_time_timeout, not both"
        )
    gap_us = int(gap_minutes) * 60 * 1_000_000

    def fold(key_tuple, pdfs, state: GroupState):
        user_id = key_tuple[0]
        out = []
        if state.hasTimedOut:
            if state.exists:
                st, en, cnt, tot, sid = state.get
                if st is not None:
                    out.append((user_id, sid, st, en, cnt, round(tot, 6)))
                    # Keep the sid counter one more timeout window
                    # (st=None ⇒ no open session) so a user returning
                    # soon numbers monotonically instead of restarting
                    # at 1 (ADVICE r3) — and re-arm the timer so the
                    # tombstone is EVICTED on the next fire: without
                    # that second removal the state store would grow
                    # one immortal row per user ever seen.
                    state.update((None, None, 0, 0.0, sid))
                    if timeout_minutes is not None:
                        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
                    else:
                        # must exceed the CURRENT watermark (a late
                        # first fire may already be past en + 2·gap)
                        state.setTimeoutTimestamp(
                            max(
                                (en + 2 * gap_us) // 1000,
                                state.getCurrentWatermarkMs()
                                + gap_us // 1000,
                            )
                            + 1
                        )
                else:
                    # second fire on an idle tombstone: evict. A user
                    # returning after this restarts at session_id 1 —
                    # the documented counter-retention bound (one extra
                    # timeout window), the price of bounded state.
                    state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            if state.exists:
                st, en, cnt, tot, sid = state.get
            else:
                st = en = None
                cnt, tot, sid = 0, 0.0, 0
            row_list = list(rows.itertuples(index=False))
            i = 0
            if st is not None:
                # Stray prefix (ADVICE r4): admitted late events more
                # than gap BEFORE the open session's start belong to
                # their own earlier session(s) under batch semantics,
                # not to the open one. Rows are sorted, so strays form
                # a prefix (once t >= st - gap, every later t is too,
                # since st only ever moves down to min(st, t)).
                # Sessionize the prefix among itself, emit those
                # sessions with the open session's number(s), and shift
                # the open session up — start-time-ordered numbering is
                # preserved relative to everything not yet emitted.
                ps = None
                pre = []
                while i < len(row_list):
                    t = int(pd.Timestamp(row_list[i].ts).value // 1000)
                    if t >= st - gap_us:
                        break
                    v = float(row_list[i].value)
                    if ps is None:
                        ps = [t, t, 1, v]
                    elif t - ps[1] > gap_us:
                        pre.append(ps)
                        ps = [t, t, 1, v]
                    else:
                        ps[1] = max(ps[1], t)
                        ps[2] += 1
                        ps[3] += v
                    i += 1
                if ps is not None:
                    pre.append(ps)
                for p in pre:
                    out.append(
                        (user_id, sid, p[0], p[1], p[2], round(p[3], 6))
                    )
                    sid += 1
            for r in row_list[i:]:
                t = int(pd.Timestamp(r.ts).value // 1000)  # epoch micros
                if st is None:
                    st, en, cnt, tot, sid = t, t, 1, float(r.value), sid + 1
                elif t - en > gap_us:
                    out.append((user_id, sid, st, en, cnt, round(tot, 6)))
                    st, en, cnt, tot, sid = t, t, 1, float(r.value), sid + 1
                else:
                    # Late events inside the open session must not move
                    # its bounds backwards (ADVICE r3): extend both ends
                    # monotonically so later gap checks compare against
                    # the true latest timestamp.
                    st, en = min(st, t), max(en, t)
                    cnt, tot = cnt + 1, tot + float(r.value)
            state.update((st, en, cnt, tot, sid))
            if timeout_minutes is not None:
                state.setTimeoutDuration(timeout_minutes * 60 * 1000)
            elif event_time_timeout and st is not None:
                # Fire once the watermark passes session_end + gap: no
                # on-time event can extend the session past that point.
                state.setTimeoutTimestamp((en + gap_us) // 1000 + 1)
        ts = lambda us_: pd.Timestamp(us_ * 1000)  # noqa: E731
        yield pd.DataFrame(
            [
                (u, s, ts(a), ts(b), c, v)
                for u, s, a, b, c, v in out
            ],
            columns=[
                "user_id", "session_id", "session_start",
                "session_end", "n_events", "total_value",
            ],
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=(
                "st long, en long, cnt long, tot double, sid long"
            ),
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.EventTimeTimeout
                if event_time_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
