from .sessions import (
    streaming_running_state,
    streaming_session_aggregates,
    streaming_turn_counts,
)

__all__ = [
    "streaming_running_state",
    "streaming_session_aggregates",
    "streaming_turn_counts",
]
