"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in watermarked
aggregations cannot express: per-key state lives in the state store
(RocksDB on a real cluster) and an Arrow-batched pandas function folds
each micro-batch into it. Used here for running corpus totals — the
"how much have we crawled per bucket so far" operator a continuously
ingesting pipeline needs with exactly-once state across restarts.

Scale notes: state is one tiny row per key; each micro-batch shuffles
on the group key once (map-side combine does NOT apply to arbitrary
stateful folds, so keep keys low-cardinality — event types, domains,
languages — not per-document)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def running_event_totals(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Cumulative (n_events, total_value) per ``key`` across ALL
    micro-batches seen so far — emitted in update mode every batch.

    State schema: (n long, v double); output mirrors the batch
    events-hourly totals but accumulates monotonically over the stream.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key} string, n_events long, total_value double"
    state_schema = "n long, v double"

    def fold(key_tuple, pdfs, state: GroupState):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {key: [key_tuple[0]], "n_events": [n], "total_value": [v]}
        )

    return events.groupBy(key).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
