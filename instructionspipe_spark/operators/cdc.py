"""Change-data-capture batch application (lakehouse MERGE INTO semantics).

The reference's pipelines treat datasets as immutable JSONL snapshots; a
production corpus at 100 TB is instead maintained incrementally — a nightly
change batch (upserts + deletes) applied to the current snapshot. This
module is the engine's deterministic MERGE: pure DataFrame (one
co-partitioned outer join; no table-format dependency), so it runs on plain
parquet today and drops onto Delta/Iceberg `MERGE INTO` unchanged.

Semantics (standard CDC apply):
- changes carry an op column: 'U' (upsert: update if key exists, else
  insert) and 'D' (delete if key exists; a delete for an absent key is a
  no-op);
- at most one change per key per batch is assumed; when the raw feed has
  several, pre-reduce with ``latest_change_per_key`` (deterministic
  last-writer-wins on a monotonically increasing sequence column with the
  op as tie break — the Debezium/Kafka compaction rule).

100 TB shape: snapshot ⋈ changes is ONE full-outer equi-join on the key —
co-partitioned with any downstream key-bucketed layout (sources/bucketing
pays the shuffle once at write); the change batch is typically orders of
magnitude smaller and broadcasts when stats allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_change_per_key(
    changes: DataFrame, key: str, seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Compact a raw change feed to one row per key: highest ``seq_col``
    wins; on an exact seq tie a delete beats an upsert (the conservative
    compaction rule — replaying the pair in either order ends deleted).

    Implementation is a per-key window, not the two-phase groupBy-max +
    join-back used for hot-keyed elections elsewhere: CDC keys are
    near-unique per batch (a handful of changes per key), so the window
    partitions are tiny AND the join-back would tempt Catalyst into
    broadcasting the raw feed scan at test scale — one shuffle on the key,
    no broadcast, is the shape that survives a feed the size of the fact."""
    w = Window.partitionBy(key).orderBy(
        F.desc(seq_col), F.desc((F.col(op_col) == "D").cast("int"))
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    strict: bool = False,
) -> DataFrame:
    """Apply a compacted change batch to a snapshot: MERGE INTO semantics
    as one full-outer equi-join. Matched + 'U' takes the change's columns;
    matched + 'D' drops the row; unmatched change with 'U' inserts;
    unmatched snapshot rows pass through. Change rows must carry exactly
    the snapshot's columns plus ``op_col``.

    Malformed ops (outside {'U','D'}, including NULL) raise via an in-plan
    ``raise_error`` on the op projection — but that guard only fires if the
    row is actually EVALUATED, so a downstream plan that prunes the change
    side (e.g. a bare ``.count()`` on the result) can complete without
    raising. Pass ``strict=True`` to additionally run an eager
    ``changes.filter(~op.isin('U','D')).isEmpty()`` check up front — one
    cheap action against the change feed (which is small relative to the
    snapshot by construction) that guarantees malformed-change detection
    regardless of downstream plan shape."""
    if strict:
        bad = changes.filter(
            ~F.col(op_col).isin("U", "D") | F.col(op_col).isNull()
        )
        if not bad.isEmpty():
            sample = [r[op_col] for r in bad.select(op_col).limit(3).collect()]
            raise ValueError(
                f"apply_changes(strict=True): change feed contains ops "
                f"outside {{'U','D'}} (sample: {sample})"
            )
    data_cols = [c for c in snapshot.columns if c != key]
    ch = changes.select(
        F.col(key).alias("__ck"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in data_cols],
    )
    # Fail loudly on an op outside {'U','D'} (including NULL): without the
    # guard, NULL op makes `has_change & (__op == 'D')` NULL, `~NULL` is
    # NULL, and the filter silently DROPS the matched snapshot row — a
    # malformed change acting as a delete.
    ch = ch.withColumn(
        "__op",
        F.when(F.col("__op").isin("U", "D"), F.col("__op")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_changes: op must be 'U' or 'D', got "),
                    F.coalesce(F.col("__op"), F.lit("NULL")),
                )
            )
        ),
    )
    joined = snapshot.join(ch, F.col(key) == F.col("__ck"), "full_outer")
    has_change = F.col("__ck").isNotNull()
    # A 'D' row is dropped whether matched (delete) or unmatched (no-op:
    # without the filter the unmatched change side would insert it).
    keep = ~(has_change & (F.col("__op") == "D"))
    out_key = F.coalesce(F.col(key), F.col("__ck")).alias(key)
    out_cols = [
        F.when(has_change, F.col(f"__c_{c}")).otherwise(F.col(c)).alias(c)
        for c in data_cols
    ]
    return joined.filter(keep).select(out_key, *out_cols)
