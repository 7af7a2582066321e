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
    (SURVEY.md §2.10 — the one streaming piece that needs batch semantics).
    With ``cache_path`` set, completions are routed through the cache-table
    protocol: prompts already answered in ANY previous micro-batch (or by a
    concurrent job) are never re-sent to the model."""
    from instructionspipe_spark.plans.cache import CachedLlm
    from instructionspipe_spark.plans.compiler import run_pipeline

    effective_llm = CachedLlm(llm, cache_path) if cache_path else llm

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = run_pipeline(batch_df, pipeline, effective_llm)
        out.write.mode("append").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def stateful_running_dedup_count(
    stream_df: DataFrame,
    key: str,
    text_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key running dedup — state holds the set of exact-text hashes seen so
    far (bounded by the watermark timeout), each micro-batch emits
    (key, batch_rows, new_uniques, total_uniques).

    This is the principled version of the reference's in-memory dedup Set
    (``etl_slimpajama_dc_proc.py:116-138``): state is per-key, checkpointed,
    recoverable, and expires with the event-time timeout instead of growing
    forever in one process's heap.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key, T.LongType()),
            T.StructField("batch_rows", T.LongType()),
            T.StructField("new_uniques", T.LongType()),
            T.StructField("total_uniques", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("hashes", T.ArrayType(T.StringType()))])

    def update(key_tuple, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        before = len(seen)
        rows = 0
        for pdf in pdfs:
            rows += len(pdf)
            for t in pdf[text_col]:
                if t is not None:
                    seen.add(hashlib.md5(str(t).encode()).hexdigest())
        state.update((list(seen),))
        yield pd.DataFrame(
            [
                {
                    key: key_tuple[0],
                    "batch_rows": rows,
                    "new_uniques": len(seen) - before,
                    "total_uniques": len(seen),
                }
            ]
        )

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stateful_running_dedup_count_tws(
    stream_df: DataFrame,
    key: str,
    text_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """`stateful_running_dedup_count` on the Spark 4 ``transformWithState``
    API: a ``StatefulProcessor`` with typed ListState instead of a raw state
    tuple. Functional twin of the applyInPandasWithState version, with the
    operational upsides of the new API at scale — per-state-variable
    encoding, state TTL, and the RocksDB state store's changelog
    checkpointing (required: set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` before starting the stream).

    Runtime dependency: the ``protobuf`` package (the StatefulProcessor API
    client talks protobuf to the JVM state server; pyspark ships it only in
    the ``connect`` extra). Without it the driver worker crashes at PRE_INIT
    with ``ImportError: cannot import name 'descriptor' from
    'google.protobuf'`` — see tests/test_streaming.py for the full
    diagnosis.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key, T.LongType()),
            T.StructField("batch_rows", T.LongType()),
            T.StructField("new_uniques", T.LongType()),
            T.StructField("total_uniques", T.LongType()),
        ]
    )

    class RunningDedup(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getListState(
                "seen", T.StructType([T.StructField("h", T.StringType())])
            )

        def handleInputRows(self, key_tuple, rows, timerValues):  # noqa: N803
            seen = {r[0] for r in self._seen.get()} if self._seen.exists() else set()
            before = len(seen)
            n_rows = 0
            for pdf in rows:
                n_rows += len(pdf)
                for t in pdf[text_col]:
                    if t is not None:
                        seen.add(hashlib.md5(str(t).encode()).hexdigest())
            new = sorted(seen)
            self._seen.put([(h,) for h in new])
            yield pd.DataFrame(
                [
                    {
                        key: key_tuple[0],
                        "batch_rows": n_rows,
                        "new_uniques": len(seen) - before,
                        "total_uniques": len(seen),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            RunningDedup(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="None",
        )
    )
