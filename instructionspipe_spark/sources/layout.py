"""Multi-dimensional data layout: Z-order clustering for row-group skipping.

The third leg of the engine's storage-layout story (next to
``sources/bucketing.py``'s co-located joins and ``sources/io.py``'s hive
partitioning + pruning): when queries filter on SEVERAL columns at once,
partitioning can serve only one of them — Z-ordering (the Delta Lake
``OPTIMIZE ZORDER BY`` technique, Morton 1966) interleaves the bits of
per-column rank buckets so rows close in ANY filtered dimension land in the
same parquet row groups, and the scan's min/max row-group statistics skip
the rest. At 100 TB this is the difference between a multi-predicate query
reading every row group of every file and reading the handful whose stat
ranges overlap the predicate box.

Determinism: bucket boundaries come from exact per-column percentile ranks
(two-phase: an exact ``percentile_approx(..., accuracy=2^31-1)`` cut
aggregate broadcast back — the length_quantile_filter pattern), so the same
input always produces the same layout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(bucket_cols: list[Column], bits: int = 8) -> Column:
    """Interleave ``bits`` bits of each already-bucketized column (values in
    [0, 2^bits)) into one Morton key: bit j of column i lands at position
    ``j * n_cols + i``. Pure integer Column expression (codegen-friendly)."""
    n = len(bucket_cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits ({bits}) * n_cols ({n}) = {bits * n} exceeds "
            "63 — the Morton key would overflow the signed 64-bit long, "
            "yielding negative keys and broken range clustering; lower bits "
            "or cluster fewer columns"
        )
    parts = [
        (F.shiftright(c.cast("long"), j) % 2) * F.lit(1 << (j * n + i)).cast("long")
        for i, c in enumerate(bucket_cols)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a + b, parts).alias("__zkey")


def with_zorder(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append a ``__zkey`` Morton column over the quantile buckets of
    ``cols``. One extra aggregate pass computes every column's 2^bits - 1
    exact percentile cuts (a single 1-row frame, broadcast); bucket lookup
    is an in-plan binary-search-free sum of comparisons bounded by 2^bits
    per column per row at bits<=4, or F.width_bucket for larger grids."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        *[
            F.percentile_approx(c, qs, 2147483647).alias(f"__cuts_{c}")
            for c in cols
        ]
    )
    out = df.join(F.broadcast(cuts))
    bucket_cols = []
    for c in cols:
        arr = F.col(f"__cuts_{c}")
        # bucket = number of cuts <= value (0..n_buckets-1); exact cuts make
        # this deterministic for any engine evaluating the same comparisons
        b = F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, cut: acc + F.when(F.col(c) >= cut, 1).otherwise(0),
        )
        bucket_cols.append(F.least(b, F.lit(n_buckets - 1)).cast("long"))
    out = out.withColumn("__zkey", zorder_key(bucket_cols, bits))
    return out.drop(*[f"__cuts_{c}" for c in cols])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
    row_group_bytes: int = 1 << 20,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``: range-partition on
    the Morton key (so files carry disjoint key ranges), sort within
    partitions, and write parquet with small row groups so min/max stats
    are fine-grained. The write pays one range shuffle ONCE; every
    multi-predicate scan afterwards skips row groups whose stat boxes miss
    the predicate box."""
    keyed = with_zorder(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .option("parquet.block.size", str(row_group_bytes))
        .parquet(path)
    )
