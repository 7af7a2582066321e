"""As-of and range joins — temporal operators Spark lacks natively.

The reference delegates all temporal reasoning to the LLM (SURVEY.md F19);
our engine does it relationally. As-of join (each left row matched to the
latest right row at-or-before its timestamp, per key) is implemented as a
composition of built-in operators — union + window last_value — rather than
``merge_asof`` in pandas, so it shuffles once on (key) and scales like any
sort-based window. Range join is an inequality join that Spark executes as a
broadcast-nested-loop when one side is small, or can be bucketed by coarse
time bins to become an equi-join (the standard range-bin trick, applied here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``right_vals`` from the right row with the
    greatest ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward'
    mirrors) sharing the ``on`` key.

    Implementation: tag and union both sides, sort within key by timestamp
    with a window running ``last(..., ignorenulls)``, keep left rows. One
    shuffle on the key, linear in |L|+|R| — no per-row probe, no pandas.
    Right-side ties on the same timestamp resolve to the last in (ts, val)
    order, deterministically.
    """
    assert direction in ("backward", "forward")
    collisions = set(right_vals) & set(left.columns)
    if collisions:
        raise ValueError(f"right_vals collide with left columns: {sorted(collisions)}; alias them first")
    lcols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_vals],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(v).alias(f"__r_{v}") for v in right_vals],
    ).select(
        *[F.col(c) for c in left.columns], F.col("__ts"), F.col("__is_left"),
        *[F.col(f"__r_{v}") for v in right_vals],
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        # right rows sort before left rows at equal ts => right row at ts == left ts matches
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            *[F.col(c) for c in left.columns], F.col("__ts"), F.col("__is_left"),
            *[F.last(f"__r_{v}", ignorenulls=True).over(w).alias(v) for v in right_vals],
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("__ts"), F.desc("__is_left"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = unioned.select(
            *[F.col(c) for c in left.columns], F.col("__ts"), F.col("__is_left"),
            *[F.first(f"__r_{v}", ignorenulls=True).over(w).alias(v) for v in right_vals],
        )
    return filled.filter(F.col("__is_left") == 1).drop("__ts", "__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Join rows where ``right_ts`` falls in [left_ts + lower, left_ts + upper].

    With ``bin_seconds`` set, both sides are bucketed into coarse time bins
    and the left side explodes to the bin range it can touch, turning the
    inequality join into an equi-join on the bin — the plan Spark picks is
    then a shuffle-hash/sort-merge join instead of a nested loop, which is
    what survives at 100 TB.

    Right-side columns colliding with left-side names come back suffixed
    ``_r`` (self-joins are the common case for event-window joins).
    """
    collisions = set(left.columns) & set(right.columns)
    renames = {c: f"{c}_r" for c in collisions}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)

    lo = F.col(left_ts) + lower
    hi = F.col(left_ts) + upper
    if bin_seconds is None:
        return left.join(right, (F.col(r_ts) >= lo) & (F.col(r_ts) <= hi))
    lbin_lo = F.floor(F.unix_timestamp(lo) / bin_seconds)
    lbin_hi = F.floor(F.unix_timestamp(hi) / bin_seconds)
    l_binned = left.withColumn("__bin", F.explode(F.sequence(lbin_lo, lbin_hi)))
    r_binned = right.withColumn("__bin", F.floor(F.unix_timestamp(F.col(r_ts)) / bin_seconds))
    return (
        l_binned.join(r_binned, "__bin")
        .filter((F.col(r_ts) >= lo) & (F.col(r_ts) <= hi))
        .drop("__bin")
    )
