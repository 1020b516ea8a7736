from .ingest import stream_events, tumbling_counts_stream, sessionize_stream

__all__ = ["stream_events", "tumbling_counts_stream", "sessionize_stream"]
