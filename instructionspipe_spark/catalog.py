"""Table catalog: load the driver's parquet tables and register SQL views.

Mirrors the reference's implicit "catalog" — JSONL paths in config files
(``apps/instructions-mapreduce/inf.py:68-71``) — but as parquet scans with
explicit views so the whole engine surface is available to ``spark.sql``.
Parquet scans get predicate pushdown + column pruning for free; at 100 TB the
same call reads a partitioned table and Catalyst prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns], which Spark reads as long
    (spark.sql.legacy.parquet.nanosAsLong) and we rebuild as TimestampType."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load each parquet table as a DataFrame keyed by table name.

    Self-sufficient on a *vanilla* SparkSession: the driver's correctness
    gate builds its own bare session, so the nanos-timestamp legacy flag is
    set here at read time (runtime-settable) rather than assumed from
    :func:`instructionspipe_spark.session.get_spark`.
    """
    from pyspark.sql import functions as F

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already-fixed static conf or restricted session; reads may still work

    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            for col in _nanos_ts_columns(path):
                # Integer div, NOT `/ 1000` in double: nanosecond epochs
                # (~1.7e18) exceed double's 2^53 integer precision, so float
                # division is off by 1 microsecond on some values.
                df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
            out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
