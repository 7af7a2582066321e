"""Structured Streaming surface (SURVEY.md §2.10)."""

from instructionspipe_spark.streaming.jobs import (  # noqa: F401
    read_jsonl_stream,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
    foreach_batch_llm,
)
