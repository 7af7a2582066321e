"""HF-datasets adapter (SURVEY.md S4; reference ``apps/training/sft.py:85-91``
loads a Hugging Face dataset for SFT).

Spark-first design: a Hugging Face dataset on disk is just files — parquet
(hub exports) or Arrow IPC (``Dataset.save_to_disk``). Parquet goes straight
through ``spark.read.parquet`` (splittable, pushdown). Arrow IPC has no
native Spark reader, so :func:`read_arrow_ipc` builds one from primitives:
a ``binaryFile`` scan distributes the FILES across the cluster, and an
Arrow-batched ``mapInPandas`` decodes each file with pyarrow on the
executor — no driver-side collect, no ``datasets`` dependency, linear scan.
One task per file (an IPC file is not splittable mid-stream), so
parallelism = file count — HF shards ``save_to_disk`` output by
``max_shard_size``, which is exactly the right granularity.

The ``datasets`` library is OPTIONAL and only used to resolve a hub NAME to
local files (:func:`read_hf_dataset` with a non-path name); everything else
runs lib-free.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

try:  # optional: hub-name resolution only
    import datasets as _hf_datasets
except Exception:  # pragma: no cover - import guard
    _hf_datasets = None


def have_hf_datasets() -> bool:
    return _hf_datasets is not None


def _arrow_schema_of(path: str):
    """Driver-side peek at ONE file's schema (footer/stream header only)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    with pa.memory_map(path) as source:
        try:
            return ipc.open_file(source).schema
        except pa.ArrowInvalid:
            return ipc.open_stream(source).schema


def read_arrow_ipc(spark: SparkSession, path: str, glob: str = "*.arrow") -> DataFrame:
    """Distributed Arrow-IPC scan: binaryFile file distribution + per-file
    pyarrow decode in ``mapInPandas``. Handles both the file format
    (random-access, what ``save_to_disk`` writes) and the stream format.
    """
    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if _glob_match(f, glob)
    ) if os.path.isdir(path) else [path]
    if not files:
        raise FileNotFoundError(f"no files matching {glob} under {path}")
    schema: T.StructType = from_arrow_schema(_arrow_schema_of(files[0]))

    binaries = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def decode(batches: Iterator) -> Iterator:
        import pyarrow.ipc as ipc

        for pdf in batches:
            for blob in pdf["content"]:
                buf = pa.BufferReader(bytes(blob))
                try:
                    table = ipc.open_file(buf).read_all()
                except pa.ArrowInvalid:
                    buf.seek(0)
                    table = ipc.open_stream(buf).read_all()
                yield table.to_pandas()

    return binaries.select("content").mapInPandas(decode, schema=schema)


def _glob_match(name: str, glob: str) -> bool:
    import fnmatch

    return fnmatch.fnmatch(name, glob)


def read_hf_dataset(spark: SparkSession, name_or_path: str, split: str | None = None) -> DataFrame:
    """S4 entry point. A local directory is read directly (parquet shards
    preferred, Arrow IPC otherwise; ``save_to_disk`` split layouts resolve
    via ``split``). A hub name needs the optional ``datasets`` library,
    which downloads/caches and then hands back local Arrow files."""
    if os.path.isdir(name_or_path):
        root = os.path.join(name_or_path, split) if split and os.path.isdir(
            os.path.join(name_or_path, split)
        ) else name_or_path
        entries = os.listdir(root)
        if any(e.endswith(".parquet") for e in entries):
            return spark.read.parquet(os.path.join(root, "*.parquet"))
        return read_arrow_ipc(spark, root)
    if _hf_datasets is None:
        raise NotImplementedError(
            "resolving a hub dataset name requires the optional `datasets` "
            "library; pass a local path of parquet/arrow files instead"
        )
    ds = _hf_datasets.load_dataset(name_or_path, split=split)
    files = [f["filename"] for f in ds.cache_files]
    if not files:
        raise ValueError(f"dataset {name_or_path} has no local cache files")
    root = os.path.dirname(files[0])
    return read_arrow_ipc(spark, root, glob=os.path.basename(files[0]).rsplit("-", 1)[0] + "*")
