from .stream import (  # noqa: F401
    incremental_sync_stream,
    windowed_event_counts,
    sessionized_counts_stream,
)
