"""Leak-free grouped train/val/test split (SURVEY.md G7).

The reference shuffles the distinct keys with a seeded RNG and slices the key
list by ratio (``apps/etl/etl_split_data_by_key.py:27-55``), so every group
lands wholly in one split. Same contract here, made deterministic and
distributed: keys are ranked by ``md5(seed || key)`` (percent_rank), rank
thresholds give the ratios, and the assignment joins back broadcast — the
fact table is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from instructionspipe_spark.operators.sampling import pseudo_random


def grouped_split(
    df: DataFrame,
    key: str,
    ratios: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign each key group wholly to one named split.

    ``ratios`` maps split name -> fraction (must sum to ~1). Groups are
    ordered by a deterministic hash of the key; cumulative ratio thresholds
    cut the ordered key space. The distinct-keys side is tiny relative to the
    data (it is the group count), so it broadcasts; at 100 TB the only
    full-data cost is the map-side hash join.
    """
    total = sum(ratios.values())
    keys = df.select(key).distinct()
    w = Window.orderBy(pseudo_random(seed, F.col(key)))
    ranked = keys.withColumn("__pr", F.percent_rank().over(w))
    expr = None
    cum = 0.0
    names = list(ratios)
    for name in names[:-1]:
        cum += ratios[name] / total
        branch = F.when(F.col("__pr") < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(F.col("__pr") < F.lit(cum), F.lit(name))
    assignment = (expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1]))
    key_splits = ranked.select(F.col(key), assignment.alias(split_col))
    return df.join(F.broadcast(key_splits), key)


def write_split_sinks(df: DataFrame, path: str, split_col: str = "split", fmt: str = "parquet") -> None:
    """Split sink (SURVEY.md S9): one partitioned write instead of the
    reference's three sequential file writes (etl_split_data_by_key.py:78-85)."""
    df.write.mode("overwrite").partitionBy(split_col).format(fmt).save(path)


def hash_split(
    df: DataFrame,
    key: str,
    ratios: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Scalable variant of :func:`grouped_split`: assign each key group by
    the VALUE of its deterministic hash instead of its rank — no distinct,
    no global window, no join; one expression per row.

    Tradeoff: split sizes are hash-proportional (exact in expectation,
    ±O(sqrt(n_keys)) in realization) rather than exactly sliced like the
    reference's shuffled-list split. Use this at 100 TB where the distinct
    key count itself is huge; use grouped_split when exact ratio slicing
    matters. Leak-freedom is identical: same key -> same hash -> same split.
    """
    total = sum(ratios.values())
    # md5 first 12 hex digits -> uniform [0, 1)
    u = F.conv(F.substring(pseudo_random(seed, F.col(key)), 1, 12), 16, 10).cast("double") / F.lit(
        float(1 << 48)
    )
    names = list(ratios)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += ratios[name] / total
        branch = F.when(u < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    assignment = expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    return df.withColumn(split_col, assignment)


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_cols: list[str],
    shard_col: str = "shard",
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic output sharding: ``shard = hash48(seed || ids) % n``.

    This is how a 100 TB pipeline shards its output files: a stateless
    narrow projection (no shuffle, no global ordering), uniform in
    expectation over uniform hash input, reproducible across engines and
    partitionings. Pair with ``repartition(n, shard_col)`` only when the
    sink genuinely needs one file per shard; otherwise let the writer see
    the column and partition-by it."""
    from instructionspipe_spark.operators.dedup import base_hash48

    key = F.concat_ws("|", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols])
    return df.withColumn(shard_col, (base_hash48(key) % F.lit(n_shards)).cast("int"))
