"""Document chunking — split long documents into bounded, optionally
overlapping windows for context-length-limited consumers.

The reference feeds whole records to the LLM and relies on max_tokens
truncation (``llm_cli.py``); a 100 TB training-data pipeline instead
pre-chunks long documents so no tokenizer ever sees unbounded input. This
is a pure narrow transformation: per row, explode a *cheap index sequence*
(chunk ordinals) and substring the text on the exploded rows — per the
Generate rule (explode indexes, never a freshly-computed heavy array), the
expensive work stays in whole-stage codegen after the explode and the
operator adds ZERO shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n_chunks(length: Column, chunk_chars: int, overlap: int) -> Column:
    """Shared chunk-count formula: 1 + ceil(max(len - chunk, 0) / stride).
    Validates here (ValueError, not assert — must survive ``python -O``)
    so neither caller can build a degenerate descending F.sequence."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got overlap={overlap} chunk_chars={chunk_chars}"
        )
    stride = chunk_chars - overlap
    return F.lit(1) + F.ceil(
        F.greatest(length - F.lit(chunk_chars), F.lit(0)) / F.lit(stride)
    ).cast("int")


def chunk_text(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = 512,
    overlap: int = 64,
    out_prefix: str = "chunk",
) -> DataFrame:
    """One row per (document, chunk): ``<prefix>_idx`` (0-based),
    ``<prefix>_start`` (1-based char offset, substring convention),
    ``<prefix>_text``. Stride = chunk_chars - overlap; the final chunk may
    be shorter; empty/NULL text yields no rows (no degenerate chunks).
    """
    stride = chunk_chars - overlap
    length = F.length(F.col(text_col))
    # Guarded sequence bounds: len<=0 (or NULL via the filter) never builds
    # a descending sequence.
    n_chunks = _n_chunks(length, chunk_chars, overlap)
    out = (
        df.filter(length > 0)
        .withColumn(f"{out_prefix}_idx", F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))))
        .withColumn(f"{out_prefix}_start", F.col(f"{out_prefix}_idx") * stride + F.lit(1))
        .withColumn(
            f"{out_prefix}_text",
            F.col(text_col).substr(F.col(f"{out_prefix}_start"), F.lit(chunk_chars)),
        )
    )
    return out


def chunk_count(text: Column, chunk_chars: int = 512, overlap: int = 64) -> Column:
    """Number of chunks chunk_text emits for ``text`` (0 for empty/NULL)."""
    length = F.length(text)
    return F.when(length > 0, _n_chunks(length, chunk_chars, overlap)).otherwise(F.lit(0))
