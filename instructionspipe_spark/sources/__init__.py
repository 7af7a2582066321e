"""Sources & sinks (SURVEY.md §2.1)."""

from instructionspipe_spark.sources.io import (  # noqa: F401
    read_csv,
    read_jsonl,
    read_parquet,
    read_binary_files,
    write_jsonl,
    write_parquet,
    multi_sink,
)
