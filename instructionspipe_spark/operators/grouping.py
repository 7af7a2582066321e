"""Grouping utilities (SURVEY.md G1, G8).

The reference builds ``Dict[key, List[record]]`` by hand
(``apps/etl/etl_sampling_by_key.py:17-32``); in Spark grouping is a shuffle on
the key with map-side partial aggregation — the canonical scalable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_counts(df: DataFrame, keys: list[str]) -> DataFrame:
    """Per-key row counts. ChatML / struct keys are grouped by their JSON
    serialization, matching the reference's json.dumps group key."""
    gcols = []
    for k in keys:
        if isinstance(df.schema[k].dataType.typeName(), str) and df.schema[k].dataType.typeName() in ("array", "struct", "map"):
            gcols.append(F.to_json(F.col(k)).alias(k))
        else:
            gcols.append(F.col(k))
    return df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("cnt"))


def distribution_check(df: DataFrame, keys: list[str]) -> DataFrame:
    """Group counts sorted descending (reference
    ``etl_sampling_by_key.py:83-90`` prints this) — returned as a DataFrame,
    with deterministic tie-break on the key for reproducible output."""
    return group_counts(df, keys).orderBy(F.desc("cnt"), *[F.asc(k) for k in keys])
