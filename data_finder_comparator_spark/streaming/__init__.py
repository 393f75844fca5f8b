from .pipeline import fuzzy_match_stream, windowed_event_counts

__all__ = ["fuzzy_match_stream", "windowed_event_counts"]
