"""Sequence packing: place documents into fixed-capacity context windows —
the step between a filtered/deduped corpus and a pretraining dataloader.

The reference stops at batching rows for LLM calls (``instructionspipe/
core.py`` batching, SURVEY.md G10); packing into token budgets is the
100 TB-scale generalization every training-data pipeline needs. Two
deterministic formulations:

- :func:`pack_token_stream` — the GPT-style concat-and-chunk model: within
  each group, documents are concatenated in id order into one token stream
  that is sliced into ``capacity``-token windows; a document may span a
  window boundary. Pure window expressions (one cumulative sum), fully
  SQL-mirrorable, one shuffle on the group key.
- :func:`pack_greedy_firstfit` — no-split packing: each document lands in
  the first bin (by id order) with room; oversized documents get a bin of
  their own. Sequential by nature, so it runs as Arrow-batched
  ``applyInPandas`` per group: pick group granularity (e.g. a hash-bucketed
  shard column) so one group's documents fit one task — the standard way a
  dataloader shards anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    capacity: int,
) -> DataFrame:
    """Concat-and-chunk packing plan: per group, documents ordered by id form
    a token stream; output says where each document starts and ends in the
    stream of ``capacity``-token windows.

    Adds: ``start_bin``, ``start_offset`` (position inside that window),
    ``end_bin`` (window holding the document's last token; equals
    ``start_bin - 1``... never — for zero-token documents it is the window
    before ``start_bin`` by convention, i.e. they occupy nothing).

    Plan: one window cumulative sum over (group, id-order) — a single
    shuffle on the group key; everything else is arithmetic.
    """
    w = Window.partitionBy(group_col).orderBy(id_col)
    tok = F.col(token_col).cast("long")
    cum_before = F.coalesce(
        F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0).cast("long")
    )
    cap = F.lit(capacity).cast("long")
    # long/long division goes through double: exact while the per-GROUP
    # token stream stays under 2^53 tokens (9e15 — far past any shard).
    return df.select(
        "*",
        (cum_before / cap).cast("long").alias("start_bin"),
        (cum_before % cap).alias("start_offset"),
        F.when(tok > 0, ((cum_before + tok - 1) / cap).cast("long"))
        .otherwise((cum_before / cap).cast("long") - 1)
        .alias("end_bin"),
    )


def pack_greedy_firstfit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    capacity: int,
) -> DataFrame:
    """No-split first-fit packing per group: scanning documents in id order,
    each goes into the lowest-numbered bin with enough remaining capacity,
    else opens a new bin. Oversized documents (> capacity) get a dedicated
    bin. Deterministic for any partitioning (order is total within a group).

    Output adds ``bin_id`` (long, dense from 0 per group). Memory per task is
    O(open bins + group rows); shard the group column so groups stay
    task-sized — the packing itself never shuffles beyond the one groupBy.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField("bin_id", T.LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        remaining: list[int] = []  # remaining capacity per bin
        bins = []
        for tok in pdf[token_col]:
            tok = int(tok) if tok is not None and not pd.isna(tok) else 0
            placed = None
            if tok <= capacity:
                for b, room in enumerate(remaining):
                    if room >= tok:
                        placed = b
                        remaining[b] = room - tok
                        break
            if placed is None:
                placed = len(remaining)
                # oversized doc: bin is born full (nothing else joins it)
                remaining.append(max(capacity - tok, 0))
            bins.append(placed)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, schema=out_schema)


def lm_block_manifest(
    df: DataFrame,
    id_col: str,
    token_col: str,
    group_col: str,
    capacity: int,
) -> DataFrame:
    """Per-training-block lineage for concat-and-chunk packing: one row per
    (group, block, document) saying how many of the block's ``capacity``
    tokens that document contributes — the manifest a dataloader (or a
    contamination audit) needs to map any training block back to its source
    documents, inverse to :func:`pack_token_stream`'s per-document view.

    Output: ``group_col, block_id, id_col, n_tokens`` (``n_tokens`` > 0;
    zero-token documents appear in no block).

    Plan: the pack_token_stream cumulative sum (one shuffle on the group
    key), then an explode of the cheap ``sequence(start_bin, end_bin)`` —
    a document adds one output row per block it touches, so output size is
    rows + boundary crossings, and the per-block token arithmetic happens
    on exploded rows in codegen.
    """
    packed = pack_token_stream(df, id_col, token_col, group_col, capacity)
    tok = F.col(token_col).cast("long")
    cap = F.lit(capacity).cast("long")
    start = F.col("start_bin") * cap + F.col("start_offset")
    end = start + tok  # exclusive
    exploded = packed.filter(tok > 0).select(
        group_col,
        id_col,
        start.alias("__s"),
        end.alias("__e"),
        F.explode(F.sequence(F.col("start_bin"), F.col("end_bin"))).alias("block_id"),
    )
    blk_start = F.col("block_id") * cap
    n_tokens = F.least(F.col("__e"), blk_start + cap) - F.greatest(F.col("__s"), blk_start)
    return exploded.select(group_col, "block_id", id_col, n_tokens.alias("n_tokens"))
