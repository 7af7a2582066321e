"""Bucketed tables: shuffle-free co-located joins and aggregations.

The reference joins nothing (SURVEY.md §2.5) so it never pays a shuffle; at
100 TB every fact⋈fact equi-join is dominated by the shuffle of both sides.
Bucketing amortizes that cost to write time: a table written with
``bucketBy(n, key)`` is hash-partitioned on disk, so any join or groupBy on
the bucket key — against another table bucketed the same way with the same
``n`` — runs with **zero Exchange** in the physical plan. This is the Spark
equivalent of the co-located MapReduce join, and the right layout for the
repeatedly-joined 100 TB fact tables (e.g. lineitem⋈orders on orderkey,
chatml-lineage⋈results on session_id — SURVEY.md J4).

Rules baked in here (violating any silently reintroduces the shuffle):
- both sides must have the SAME bucket count (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
- the join keys must be EXACTLY the bucket columns,
- the scan must come from the catalog (``spark.table``), not a bare
  ``read.parquet`` of the files, else bucket metadata is lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted) table.

    ``sort_cols`` additionally sorts within each bucket file, which lets a
    sort-merge join skip its Sort nodes too. ``path`` makes the table
    external (data at ``path``, metadata in the session catalog).
    """
    spark = df.sparkSession
    parts = table.split(".")
    if len(parts) > 2 or any(not s or "`" in s for s in parts):
        raise ValueError(
            f"write_bucketed: invalid table name {table!r} — expected "
            "'table' or 'db.table' with non-empty, backtick-free segments"
        )
    quoted = ".".join(f"`{s}`" for s in parts)
    if mode == "overwrite":
        if spark.catalog.tableExists(table):
            # DROP TABLE removes a MANAGED table's data itself (and leaves
            # EXTERNAL data alone) — no path reconstruction needed.
            spark.sql(f"DROP TABLE IF EXISTS {quoted}")
        elif path is None and len(parts) == 1:
            # Orphaned managed LOCATION from a previous session: the
            # warehouse dir persists while the in-memory catalog does not,
            # so saveAsTable fails with LOCATION_ALREADY_EXISTS even in
            # overwrite mode. Only the unqualified default-database layout
            # (warehouse/<table>) is safely reconstructible; qualified
            # names have no catalog entry to derive a location from, so we
            # refuse to guess and let saveAsTable fail loudly instead of
            # recursively deleting a path that may hold unrelated data.
            jvm = spark._jvm
            loc = jvm.org.apache.hadoop.fs.Path(
                spark.conf.get("spark.sql.warehouse.dir"), parts[0].lower()
            )
            fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(loc):
                fs.delete(loc, True)
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog scan that preserves bucket metadata (a bare
    ``spark.read.parquet`` of the same files would NOT — the output
    partitioning would be unknown and joins would shuffle again)."""
    return spark.table(table)


def is_bucket_join_colocated(joined: DataFrame) -> bool:
    """True when the physical plan of ``joined`` contains no Exchange —
    i.e. the join really runs bucket-to-bucket. Use in tests/CI to guard
    the layout contract (bucket counts drifting apart breaks it silently)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
