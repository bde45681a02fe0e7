"""Structured Streaming tier (extension — SURVEY.md §2.3 marks streaming
absent from the reference; M5 in the build plan)."""

from hive_udf_neologd_spark.streaming.term_counts import (
    read_document_stream,
    read_event_stream,
    streaming_event_counts,
    streaming_sessionize,
    streaming_term_counts,
    streaming_user_running_totals,
)

__all__ = [
    "read_document_stream",
    "read_event_stream",
    "streaming_event_counts",
    "streaming_sessionize",
    "streaming_term_counts",
    "streaming_user_running_totals",
]
