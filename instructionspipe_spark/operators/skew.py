"""Skew mitigation (the brief's 'salting for skew' scale requirement).

AQE's skew-join splitting handles skewed JOINS automatically
(session.py enables it); skewed GROUP BY keys still funnel one key's rows
into one reducer. :func:`salted_aggregate` is the standard two-phase rewrite:
append a deterministic salt to the key, partially aggregate on (key, salt)
— spreading one hot key over ``salt_buckets`` reducers — then finish on the
key alone. Works for any algebraic aggregate (sum/count/min/max merge); avg
must be decomposed into sum+count by the caller.

Spark already does map-side partial aggregation inside a partition; salting
matters when one key's rows span MANY partitions (the partials still all
land on one reducer). Two shuffles of pre-aggregated data beat one shuffle
with a hot reducer whenever the key is genuinely skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Merge function for each supported algebraic aggregate: how to combine the
# per-salt partials into the final value.
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (fn, input column) with fn in
    sum/count/min/max. ``salt_on`` defaults to a deterministic hash of all
    non-key columns (any row-varying expression works; monotonically
    increasing id is fine too but partition-dependent).

    Example::

        salted_aggregate(events, ["event_type"],
                         {"n": ("count", "*"), "total": ("sum", "value")})
    """
    unsupported = {f for f, _ in aggs.values()} - set(_MERGES)
    if unsupported:
        raise ValueError(f"unsupported aggregate fns for salting: {sorted(unsupported)}")

    if salt_on is None:
        non_key = [c for c in df.columns if c not in keys]
        salt_on = F.abs(F.hash(*[F.col(c) for c in non_key])) if non_key else F.lit(0)
    salted = df.withColumn("__salt", salt_on % F.lit(salt_buckets))

    partial_exprs = []
    for out, (fn, col) in aggs.items():
        c = F.lit(1) if col == "*" else F.col(col)
        expr = F.count(c) if fn == "count" else getattr(F, fn)(c)
        partial_exprs.append(expr.alias(f"__p_{out}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)

    final_exprs = [
        _MERGES[fn](F.col(f"__p_{out}")).alias(out) for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)
