"""Structured Streaming surfaces (watermarked windows, streaming dedup)."""

from .stateful import running_event_totals  # noqa: F401
from .windows import (  # noqa: F401
    hourly_event_counts,
    run_to_memory,
    stream_events,
    streaming_exact_dedup,
)
