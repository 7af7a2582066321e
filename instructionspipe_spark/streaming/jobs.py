"""Streaming jobs (SURVEY.md §2.10).

The reference's only "streaming" is a readline loop with in-memory dedup
state (``apps/etl/etl_slimpajama_dc_proc.py:119-166``) and append-mode JSONL
sinks — single process, state lost on crash. Here the same jobs are
Structured Streaming: checkpointed file-source ingest, watermarked stateful
dedup (bounded state — the reference's Set grows forever), and event-time
tumbling/sliding/session windows with late-data handling, none of which the
reference can express (its README concedes no end-to-end streaming,
README.md:95-97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source streaming JSONL scan (S2): each micro-batch picks up new
    files; schema is mandatory (no inference mid-stream)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def streaming_dedup(df: DataFrame, keys: list[str], ts_col: str, watermark: str = "1 hour") -> DataFrame:
    """Watermarked streaming dedup (G4 at scale): exact-key dedup with state
    that expires past the watermark instead of growing unboundedly."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def tumbling_window_agg(
    df: DataFrame, ts_col: str, window: str, aggs: dict[str, str], watermark: str = "1 hour"
) -> DataFrame:
    """Event-time tumbling window aggregation; ``aggs`` maps column -> fn."""
    exprs = [getattr(F, fn)(c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window))
        .agg(*exprs)
        .select(F.col("window.start").alias("window_start"), F.col("window.end").alias("window_end"), *[F.col(f"{fn}_{c}") for c, fn in aggs.items()])
    )


def sliding_window_agg(
    df: DataFrame, ts_col: str, window: str, slide: str, aggs: dict[str, str], watermark: str = "1 hour"
) -> DataFrame:
    exprs = [getattr(F, fn)(c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide))
        .agg(*exprs)
        .select(F.col("window.start").alias("window_start"), F.col("window.end").alias("window_end"), *[F.col(f"{fn}_{c}") for c, fn in aggs.items()])
    )


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, key: str, watermark: str = "1 hour"
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge per key."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def foreach_batch_llm(stream_df: DataFrame, pipeline, llm, cache_path: str, checkpoint: str, out_path: str):
    """Streaming LLM stage: run the instruction pipeline per micro-batch via
    ``foreachBatch`` so each batch reuses the persistent cache table
    (SURVEY.md §2.10 — the one streaming piece that needs batch semantics)."""
    from instructionspipe_spark.plans.compiler import run_pipeline

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = run_pipeline(batch_df, pipeline, llm)
        out.write.mode("append").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
