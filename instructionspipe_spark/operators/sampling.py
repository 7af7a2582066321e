"""Sampling (SURVEY.md G6, G9) with deterministic hash-based pseudo-randomness.

The reference samples with seeded ``random.sample`` per group
(``apps/etl/etl_sampling_by_key.py:56-80``) and ``Dataset.shuffle(seed)``
(``apps/training/sft.py:93-110``). Python RNG state cannot be reproduced in a
distributed engine (and Spark's ``rand(seed)`` is partition-dependent), so the
pseudo-random order here is ``md5(seed || key)`` — stable under repartitioning
and reproducible in any engine with md5. This is strictly stronger
determinism than the reference (same result on 1 node or 1000).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pseudo_random(seed: int | str, *cols: Column) -> Column:
    """Deterministic pseudo-random sort key: md5 over seed + column values."""
    parts: list[Column] = [F.lit(str(seed))]
    for c in cols:
        parts.extend([F.lit("|"), c.cast("string")])
    return F.md5(F.concat(*parts))


def capped_group_sample(
    df: DataFrame,
    keys: list[str],
    max_group_size: int,
    seed: int = 2,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group capped sample: ``min(|g|, max_group_size)`` rows per key
    group, chosen by deterministic pseudo-random order (reference default
    seed=2). ``id_cols`` salt the hash so identical rows order distinctly;
    they default to all non-key columns. Single shuffle on the group keys."""
    id_cols = id_cols or [c for c in df.columns if c not in keys]
    order = pseudo_random(seed, *[F.col(c) for c in id_cols])
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_group_size)
        .drop("__rn")
    )


def seeded_shuffle(df: DataFrame, seed: int, id_cols: list[str]) -> DataFrame:
    """Global deterministic shuffle: total order by md5(seed || id)."""
    return df.orderBy(pseudo_random(seed, *[F.col(c) for c in id_cols]))


def seeded_head(df: DataFrame, n: int, seed: int, id_cols: list[str]) -> DataFrame:
    """Shuffle-then-head (reference G9): deterministic top-n of the seeded
    shuffle. Spark executes this as a TakeOrdered (per-partition top-n then
    merge) — no full sort materialization."""
    return seeded_shuffle(df, seed, id_cols).limit(n)


def hash_uniform(seed: int | str, *cols: Column) -> Column:
    """Deterministic uniform in (0, 1): 48-bit md5 slice scaled into the open
    interval — the same engine-portable trick as :func:`pseudo_random`, but
    numeric so it can parameterize weighted keys."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(str(seed)), *sum([[F.lit("|"), c.cast("string")] for c in cols], []))), 1, 12), 16, 10).cast("double")
    return (h + F.lit(1.0)) / F.lit(float((1 << 48) + 1))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    seed: int,
    id_cols: list[str],
    group_cols: list[str] | None = None,
    key_round: int = 6,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis): each row
    draws ``u = hash_uniform(seed, ids)`` and ranks by ``ln(u) / w``
    descending — the top ``n`` rows per group are exactly a w-weighted
    draw. Deterministic under any partitioning; rows with weight <= 0 are
    excluded (zero mass). One shuffle (the per-group window; a TakeOrdered
    when ungrouped).

    Ranking uses the key ROUNDED to ``key_round`` decimals with the id
    columns as tie-break: Spark and an oracle engine may differ in the last
    ulp of ``ln``, and an unrounded rank would flip near-ties between
    engines (same rule as the similarity top-k operators).

    The zero-mass exclusion runs as a NULL-guarded key filtered AFTER the
    rank, not as a pre-filter: a ``filter(w > 0)`` before the projection
    gets pushed through it, substituting the (possibly expensive) weight
    expression into the predicate and recomputing it per row — measured 2x
    on the quality-weighted gated query. NULL keys sort last under DESC, so
    the top-n is unchanged.
    """
    w = F.col(weight_col).cast("double")
    u = hash_uniform(seed, *[F.col(c) for c in id_cols])
    key = F.when(w > 0, F.round(F.log(u) / w, key_round))
    order = [F.desc("__wkey")] + [F.asc(c) for c in id_cols]
    keyed = df.withColumn("__wkey", key)
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(*order)
        return (
            keyed.withColumn("__rn", F.row_number().over(win))
            .filter((F.col("__rn") <= n) & F.col("__wkey").isNotNull())
            .drop("__wkey", "__rn")
        )
    return (
        keyed.orderBy(*order)
        .limit(n)
        .filter(F.col("__wkey").isNotNull())
        .drop("__wkey")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int,
    id_cols: list[str],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sample at explicit ``fractions`` (the
    distributed analogue of ``sampleBy``, made deterministic): a row of
    stratum ``s`` survives iff ``hash_uniform(seed, ids) < fractions[s]``.
    Strata absent from the map sample at ``default_fraction``.

    Scale shape: a pure narrow filter — no shuffle, no per-stratum pass;
    the expected per-stratum yield is exact in distribution and the
    realized sample is identical under any partitioning and in any engine
    with md5 (unlike ``DataFrame.sampleBy``, whose draw depends on
    partition layout)."""
    u = hash_uniform(seed, *[F.col(c) for c in id_cols])
    rate = F.lit(float(default_fraction))
    for s, f in fractions.items():
        rate = F.when(F.col(strata_col) == s, F.lit(float(f))).otherwise(rate)
    return df.filter(u < rate)


def temperature_mixture_sample(
    df: DataFrame,
    source_col: str,
    target_rows: int,
    alpha: float = 0.5,
    seed: int = 11,
    id_cols: list[str] | None = None,
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-based corpus mixture: sample each source at a rate
    proportional to ``count(source) ** alpha`` (alpha < 1 upweights small
    sources — the standard multilingual/multi-corpus rebalancing), scaled
    so the expected total is ``target_rows``. Rates cap at 1.

    Everything stays in-plan: per-source counts are a tiny aggregate, the
    normalizing sum is a window over that aggregate (cardinality = number
    of sources), and the rates broadcast-join back onto the fact table —
    the corpus itself is never shuffled, only filtered. ``rate_col``
    optionally exposes the applied rate for auditing."""
    id_cols = id_cols or [source_col]
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    pow_n = F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    # normalizer as a 1-row scalar broadcast (not a no-partition window,
    # which would emit a single-partition warning even on the tiny frame)
    norm = counts.agg(F.sum(pow_n).alias("__norm"))
    rates = counts.crossJoin(F.broadcast(norm)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_rows)) * pow_n / F.col("__norm") / F.col("__n").cast("double"),
        ).alias("__rate"),
    )
    u = hash_uniform(seed, *[F.col(c) for c in id_cols])
    out = df.join(F.broadcast(rates), source_col).filter(u < F.col("__rate"))
    if rate_col:
        return out.withColumn(rate_col, F.round(F.col("__rate"), 6)).drop("__rate")
    return out.drop("__rate")


def token_budget_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_col: Column | str,
    budgets: Column,
    seed: int = 7,
    bucket_chars: int = 1,
) -> DataFrame:
    """Fill a per-source TOKEN budget with a seeded sample — the mixture
    primitive training pipelines actually need (mixture specs are written
    in tokens, not documents): within each source, docs are ordered by a
    seeded hash and the maximal PREFIX whose inclusive token cumsum stays
    <= the source's budget is kept (contiguous prefix, so the selection is
    a uniform random sample of the source truncated at the budget;
    deterministic for a fixed seed under any partitioning).

    ``budgets`` is a Column computing the budget from the source row (a
    literal map lookup, a CASE, a join result materialized beforehand).

    Scale shape — the naive formulation is one running-sum window
    partitioned by source, which puts an entire (possibly huge) source on
    ONE task. Here the seeded hash's first ``bucket_chars`` hex chars
    split each source into 16^bucket_chars ordered buckets whose order is
    a PREFIX of the global hash order, so budget allocation runs in two
    phases: bucket-level token sums (tiny: sources x buckets rows) get a
    bucket-prefix window on the driver-small frame; buckets entirely
    inside the budget pass their rows through with NO row-level window,
    buckets entirely past it drop, and only the single BOUNDARY bucket
    per source (1/16th of the source at the default) pays the row-level
    running sum. Raise ``bucket_chars`` to 2 (256 buckets) when a source
    is large enough that 1/16th of it still skews a task.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    h = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))
    keyed = df.select(
        F.col(source_col).alias("__src"),
        F.col(id_col).alias("__id"),
        F.coalesce(tok.cast("long"), F.lit(0)).alias("__tok"),
        h.alias("__h"),
        budgets.cast("long").alias("__budget"),
    ).withColumn("__bucket", F.substring("__h", 1, bucket_chars))

    bsums = keyed.groupBy("__src", "__budget", "__bucket").agg(
        F.sum("__tok").alias("__bt")
    )
    wb = (
        Window.partitionBy("__src")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bsums.withColumn("__before", F.coalesce(F.sum("__bt").over(wb), F.lit(0)))
    verdict = bpre.select(
        "__src",
        "__bucket",
        "__before",
        F.when(F.col("__before") + F.col("__bt") <= F.col("__budget"), F.lit("all"))
        # strictly-greater: at __before == __budget a bucket whose head rows
        # are zero-token still contributes them (inclusive cumsum stays ==
        # budget), exactly like the naive single-window rule
        .when(F.col("__before") > F.col("__budget"), F.lit("none"))
        .otherwise(F.lit("boundary"))
        .alias("__verdict"),
    )
    tagged = keyed.join(F.broadcast(verdict), ["__src", "__bucket"])
    whole = tagged.filter(F.col("__verdict") == "all")
    wr = (
        Window.partitionBy("__src", "__bucket")
        .orderBy("__h", "__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        tagged.filter(F.col("__verdict") == "boundary")
        .withColumn("__cum", F.col("__before") + F.sum("__tok").over(wr))
        .filter(F.col("__cum") <= F.col("__budget"))
        .drop("__cum")
    )
    picked = whole.unionByName(boundary).select(
        F.col("__id").alias(id_col), F.col("__tok").alias("n_tokens")
    )
    return df.join(picked, id_col)
