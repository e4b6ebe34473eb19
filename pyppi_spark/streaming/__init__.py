from .sessions import streaming_session_aggregates, streaming_turn_counts

__all__ = ["streaming_session_aggregates", "streaming_turn_counts"]
