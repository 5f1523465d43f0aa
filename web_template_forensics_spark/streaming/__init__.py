from .ingest import latest_state_stream, windowed_event_counts  # noqa: F401
