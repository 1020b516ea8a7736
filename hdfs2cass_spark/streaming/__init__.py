from .ingest import stream_events, tumbling_counts_stream, sessionize_stream
from .bulk_ingest import stream_bulk_load

__all__ = ["stream_events", "tumbling_counts_stream", "sessionize_stream", "stream_bulk_load"]
