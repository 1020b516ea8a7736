from .ingest import (
    sessionize_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from .bulk_ingest import stream_bulk_load
from .stateful import streaming_dedup_first
from .decontam import read_scored, stream_documents, stream_decontamination
from .neardup import near_dup_decisions_batch, read_decisions, stream_near_dup
from .curate import curate_decisions_batch, read_curated, stream_curate
from .rag import rag_report_from_index, stream_rag_index
from .scrub import read_scrubbed, stream_scrub
from .bloom import bloom_report, read_bloom_words, stream_bloom_enroll
from .winnow import read_winnow_decisions, stream_winnow, winnow_decisions_batch

__all__ = [
    "stream_events",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "sessionize_stream",
    "stream_bulk_load",
    "streaming_dedup_first",
    "stream_documents",
    "stream_decontamination",
    "read_scored",
    "stream_near_dup",
    "near_dup_decisions_batch",
    "read_decisions",
    "stream_curate",
    "curate_decisions_batch",
    "read_curated",
    "stream_rag_index",
    "rag_report_from_index",
    "bloom_report",
    "read_bloom_words",
    "stream_bloom_enroll",
    "read_winnow_decisions",
    "stream_winnow",
    "winnow_decisions_batch",
    "stream_scrub",
    "read_scrubbed",
]
