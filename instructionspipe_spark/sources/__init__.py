"""Sources & sinks (SURVEY.md §2.1)."""

from instructionspipe_spark.sources.io import (  # noqa: F401
    append_incremental,
    read_csv,
    read_jsonl,
    read_orc,
    read_parquet,
    read_binary_files,
    write_if_absent,
    write_jsonl,
    write_orc,
    write_parquet,
    multi_sink,
)
from instructionspipe_spark.sources.hf import (  # noqa: F401
    have_hf_datasets,
    read_arrow_ipc,
    read_hf_dataset,
)
from instructionspipe_spark.sources.bucketing import (  # noqa: F401
    bucketed,
    is_bucket_join_colocated,
    write_bucketed,
)
