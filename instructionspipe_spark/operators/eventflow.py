"""Event-flow analytics: SCD2 validity intervals, ordered funnels, and
cohort retention — the classic event-table OLAP trio, pure DataFrame.

The reference has no event-analytics surface; these close the gap between
its record-pipeline operators and what an analytics engine is asked to do
with the same tables (TESTDATA.md `events`). All three are one-or-two
shuffle plans keyed on the entity id, so they co-partition with any
id-bucketed layout at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an event log: per
    ``key``, each CHANGE of ``attr`` (ordered by ``ts_col`` with
    ``tiebreak`` for equal timestamps) opens a validity interval
    ``[valid_from, valid_to)``; the current value's interval is open
    (valid_to NULL). Consecutive equal values collapse into one interval.
    One shuffle on the key; both windows share the same ordering so the
    sort is paid once."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    changed = F.col(attr) != F.lag(attr).over(w)
    points = df.withColumn(
        "__chg", F.coalesce(changed, F.lit(True))  # first row opens
    ).filter(F.col("__chg"))
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return points.select(
        F.col(key),
        F.col(attr),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def funnel_counts(
    df: DataFrame,
    key: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Ordered-funnel completion counts: how many entities performed
    ``steps[0]``, then ``steps[1]`` STRICTLY AFTER it, then ``steps[2]``
    strictly after that, ... Emits one row per step: (step, n_users).
    ``max_gap`` (an INTERVAL string, e.g. ``"7 days"``) bounds each
    step-to-step gap — the conversion-window form every real funnel uses
    (a purchase a year after the click is not a conversion). Semantics are
    FIRST-QUALIFYING-EVENT greedy (each stage anchors on the earliest
    event that qualifies against the previous frontier — the
    Amplitude/Mixpanel funnel convention), not a global search over event
    subsequences; a user whose only conversion path routes through a LATER
    step event is counted out, by design, in both this plan and the
    oracle.

    Plan: stage i is a groupBy(key) MIN(ts) over the step's events filtered
    against stage i-1's frontier — each stage is one key-bounded aggregate
    joined back on the key (the frontier frame is entity-bounded, so the
    join broadcasts when stats allow and co-partitions otherwise); no
    per-entity event arrays are ever collected, so a whale user with 10^9
    events costs an aggregate, not a sort."""
    frontier = None
    counts = []
    spark = df.sparkSession
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step)
        if frontier is None:
            stage = ev.groupBy(key).agg(F.min(ts_col).alias("__t"))
        else:
            # Hint the entity-bounded frontier as the build side: unhinted,
            # Catalyst happily builds on the raw filtered event scan at
            # test scale — the wrong side by definition at 100 TB (the
            # fact must stream; broadcast_if_small drops the hint when the
            # frontier outgrows the threshold and the join falls back to a
            # key-co-partitioned SMJ).
            from instructionspipe_spark.session import broadcast_if_small

            gap_ok = F.lit(True)
            if max_gap is not None:
                gap_ok = F.col(ts_col) <= F.col("__prev") + F.expr(f"INTERVAL {max_gap}")
            stage = (
                ev.join(broadcast_if_small(frontier.withColumnRenamed("__t", "__prev")), key)
                .filter((F.col(ts_col) > F.col("__prev")) & gap_ok)
                .groupBy(key)
                .agg(F.min(ts_col).alias("__t"))
            )
        frontier = stage
        counts.append(
            stage.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(f"step{i + 1}_{step}").alias("step"), "n_users"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_matrix(
    df: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: cohort = the entity's first-seen ISO week;
    for every (cohort_week, week_offset) cell, the number of distinct
    entities from that cohort active in that week. Two key-bounded
    aggregates (first-seen, then the cell counts over the firsts join);
    the firsts frame is entity-bounded so the join broadcasts at test
    scale and co-partitions on the key at 100 TB."""
    # cohort_week stays TIMESTAMP (date_trunc's native type): DATE columns
    # round-trip asymmetrically through the differential harness's pandas
    # conversion (Spark date -> datetime.date, DuckDB date -> Timestamp).
    week = F.date_trunc("week", F.col(ts_col))
    firsts = df.groupBy(key).agg(F.min(week).alias("__cohort"))
    return (
        df.join(firsts, key)
        .select(
            F.col("__cohort").alias("cohort_week"),
            (F.datediff(F.to_date(week), F.to_date("__cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
            F.col(key),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(key).alias("n_active"))
    )


def funnel_stage_times(
    df: DataFrame,
    key: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Per-entity funnel frontier timestamps: one row per entity that
    completed step 1, with columns ``t1..tn`` (NULL from the first
    uncompleted step on) under the same first-qualifying-event greedy as
    :func:`funnel_counts`. The latency-analysis face of the funnel: gaps
    ``t2-t1``, ``t3-t2`` are the time-to-convert distributions."""
    from instructionspipe_spark.session import broadcast_if_small

    stages: list[DataFrame] = []
    prev = None  # (key, __prev): the previous stage's frontier timestamps
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step)
        col = f"t{i + 1}"
        if prev is None:
            stage = ev.groupBy(key).agg(F.min(ts_col).alias(col))
        else:
            gap_ok = F.lit(True)
            if max_gap is not None:
                gap_ok = F.col(ts_col) <= F.col("__prev") + F.expr(f"INTERVAL {max_gap}")
            stage = (
                ev.join(broadcast_if_small(prev), key)
                .filter((F.col(ts_col) > F.col("__prev")) & gap_ok)
                .groupBy(key)
                .agg(F.min(ts_col).alias(col))
            )
        stages.append(stage)
        prev = stage.select(key, F.col(col).alias("__prev"))
    out = stages[0]
    for s in stages[1:]:
        out = out.join(s, key, "left")
    return out
