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


def heavy_hitters(
    df: DataFrame, item_col: str, k: int = 10, capacity: int | None = None
) -> DataFrame:
    """EXACT top-``k`` most frequent items with SKETCH-BOUNDED shuffle —
    the 100 TB form of "top tokens/domains/ngrams", where the exact
    groupBy would shuffle one row per distinct item in the universe.

    Phase 1 (map-side, zero shuffle): each partition runs a mergeable
    Misra-Gries summary (Misra & Gries 1982; mergeability per Agarwal et
    al. 2012) with ``capacity`` counters over its item stream and emits
    only its surviving counter KEYS — ≤ capacity rows per partition.
    Pigeonhole guarantee: any item with global frequency ≥ n/capacity
    exceeds n_p/capacity in at least one partition, so it survives there
    and enters the candidate set. Phase 2: exact occurrence counts for the
    candidates only (broadcast semi-join + a groupBy bounded by
    |candidates|, not the universe), then the exact top-k with a
    deterministic (count desc, item asc) tie-break.

    The result is EXACT whenever the true k-th item's frequency is
    ≥ n/capacity (default capacity 8*k); below that bound a rare top-k
    item can miss the candidate set — size capacity to the expected
    frequency floor. Output: ``(item_col, n_occurrences, rank)``.
    """
    import pandas as pd  # noqa: F401 — driver-side presence check

    from pyspark.sql import Window
    from pyspark.sql import types as T

    cap = capacity if capacity is not None else 8 * k
    if cap < k:
        raise ValueError(
            f"heavy_hitters: capacity ({cap}) must be >= k ({k}) — a "
            "Misra-Gries summary smaller than k cannot hold k candidates"
        )
    item_type = df.schema[item_col].dataType
    out_schema = T.StructType([T.StructField(item_col, item_type)])

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf[item_col].dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > cap:
                # batch decrement: subtract the (cap+1)-th largest count
                # from everyone, drop non-positives — the vectorized form
                # of Misra-Gries' decrement-all step, same error bound.
                thresh = sorted(counters.values(), reverse=True)[cap]
                counters = {
                    i: c - thresh for i, c in counters.items() if c - thresh > 0
                }
        yield pd.DataFrame({item_col: pd.Series(list(counters.keys()), dtype=object)})

    candidates = df.select(item_col).mapInPandas(mg_partition, schema=out_schema).distinct()
    counts = (
        df.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc(item_col)).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc(item_col))
    return top.withColumn("rank", F.row_number().over(w))
