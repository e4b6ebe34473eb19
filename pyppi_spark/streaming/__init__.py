from .sessions import (
    running_state_batch,
    session_window_aggregates,
    streaming_exact_dedup,
    streaming_running_state,
    streaming_session_aggregates,
    streaming_turn_counts,
)
from .dedup import incremental_dedup_batch, streaming_incremental_dedup
from .quality import quality_filter_batch, streaming_quality_filter

__all__ = [
    "quality_filter_batch",
    "streaming_quality_filter",
    "running_state_batch",
    "session_window_aggregates",
    "streaming_exact_dedup",
    "streaming_running_state",
    "streaming_session_aggregates",
    "streaming_turn_counts",
    "incremental_dedup_batch",
    "streaming_incremental_dedup",
]
