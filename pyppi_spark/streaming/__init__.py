from .sessions import (
    running_state_batch,
    session_window_aggregates,
    streaming_exact_dedup,
    streaming_running_state,
    streaming_session_aggregates,
    streaming_turn_counts,
)

__all__ = [
    "running_state_batch",
    "session_window_aggregates",
    "streaming_exact_dedup",
    "streaming_running_state",
    "streaming_session_aggregates",
    "streaming_turn_counts",
]
