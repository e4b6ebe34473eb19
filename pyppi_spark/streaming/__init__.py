from .sessions import (
    running_state_batch,
    session_window_aggregates,
    streaming_exact_dedup,
    streaming_running_state,
    streaming_session_aggregates,
    streaming_turn_counts,
)
from .dedup import incremental_dedup_batch, streaming_incremental_dedup

__all__ = [
    "running_state_batch",
    "session_window_aggregates",
    "streaming_exact_dedup",
    "streaming_running_state",
    "streaming_session_aggregates",
    "streaming_turn_counts",
    "incremental_dedup_batch",
    "streaming_incremental_dedup",
]
