from .events_stream import (  # noqa: F401
    read_events_stream,
    stream_to_memory,
    windowed_event_counts,
)
from .neardup_stream import (  # noqa: F401
    ingest_batch_neardup,
    neardup_ingest_stream,
)
