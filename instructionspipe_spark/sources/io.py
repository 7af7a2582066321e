"""Scans and sinks (SURVEY.md S1-S3, S6-S9).

The reference reads JSONL with per-line ``json.loads`` loops
(``apps/instructions-mapreduce/inf.py:68-71`` and four clones) and writes by
appending serialized lines (``src/python/instructionspipe/utils.py:30-41``).
Here every scan is a Spark reader (splittable, schema-aware, predicate
pushdown where the format supports it) and every sink a ``DataFrameWriter``
(atomic job commit, append/overwrite modes, partitioned layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None, permissive: bool = True
) -> DataFrame:
    """Newline-delimited JSON scan (S1). Blank lines are dropped natively.
    Always pass a schema in production: schema inference is a full extra
    pass over 100 TB."""
    reader = spark.read.option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, header: bool = True
) -> DataFrame:
    """CSV scan (S3; reference loads CSV via pandas in apps/training/sft.py:77-91)."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Binary-file scan (S6 substrate): path, modificationTime, length,
    content(binary) — the multimodal ingestion point (PDF/image/audio bytes
    become an opaque binary column with metadata; decode happens in a
    mapInPandas stage, see streaming/multimodal plumbing)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (S7): one JSON object per line, append or overwrite."""
    df.write.mode(mode).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def multi_sink(df: DataFrame, sinks: dict[str, tuple[list[str], str]], fmt: str = "parquet") -> None:
    """Multi-sink fan-out (S8): one cached intermediate, N projected writes
    (the reference writes results/chatmls/chatml-meta from one run,
    ``apps/instructions-mapreduce/inf.py:80-85``). ``sinks`` maps path ->
    (columns, mode). Caching avoids recomputing the pipeline per sink."""
    df.persist()
    try:
        for path, (cols, mode) in sinks.items():
            df.select(*cols).write.mode(mode).format(fmt).save(path)
    finally:
        df.unpersist()
