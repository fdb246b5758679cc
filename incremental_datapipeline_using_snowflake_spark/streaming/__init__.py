"""Structured Streaming surface: changelog readStream (CDC) + event-time
window operators (tumbling / sliding / session)."""

from .incremental import changelog_stream, run_available_now, stream_harmonize
from .stateful import dedup_with_state, running_stats, running_stats_batch
from .windows import (
    session_stats_batch,
    session_window_streaming,
    sessionize_batch,
    sliding_window_agg,
    tumbling_window_agg,
    with_watermark,
)

__all__ = [
    "changelog_stream",
    "dedup_with_state",
    "running_stats",
    "running_stats_batch",
    "run_available_now",
    "stream_harmonize",
    "sessionize_batch",
    "session_stats_batch",
    "session_window_streaming",
    "sliding_window_agg",
    "tumbling_window_agg",
    "with_watermark",
]
