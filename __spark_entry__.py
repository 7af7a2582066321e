"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame callables (see instructionspipe_spark/registry.py).
``oracle_sql()`` — matching DuckDB SQL; hash-heavy oracles are generated from
the same Python constants as the Spark expressions, so parity is structural.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the instruction map/reduce pipeline (MockLlm) over the
    documents table at sf0.001 — the reference's core capability, end to end."""
    from instructionspipe_spark.registry import QUERIES

    return QUERIES["instructions_mapreduce"](spark, "/root/testdata/sf0.001")


# Gate rotation: the driver's correctness harness samples the FIRST 50
# entries of queries(). Round-6 priority order (VERDICT_r5 "Next round" #1):
# 1. The NINE never-driver-gated queries — the five late-r5 additions
#    (char_entropy_quality, incremental_batch_dedup, similarity_pq_topk,
#    similarity_ivfadc_topk, template_block_strip) plus the four that missed
#    every rotation (lsh_bucket_stats, frequent_ngrams, lm_corpus_blocks,
#    agentic_routed_fanout).
# 2. The TWO new r6 streaming-equivalence queries (streaming_tumbling_equiv,
#    streaming_band_admission) — first oracle rows for the streaming layer.
# 3. word_block_dedup (its survivor election changed this round: packed-long
#    key -> min(struct) — re-earn the gate record on the new code) and
#    q6_forecast_revenue (last gated r1, the longest-standing record).
# 4. Backfill: 37 of the r4-gated cohort (longest unguarded). Left for
#    ORACLE_FULL coverage this round: family-redundant rows whose siblings
#    were gated r5 (q1/q3/q5 of the 15-query TPC-H family; agg_rollup/
#    agg_distinct/agg_cube next to grouping_sets/salted/pivot/unpivot;
#    tumbling/session/sliding batch windows next to window_moving_avg and
#    the new streaming twins) plus cache_keys (inside cached_completions).
_GATE_FIRST = (
    "char_entropy_quality", "incremental_batch_dedup", "similarity_pq_topk",
    "similarity_ivfadc_topk", "template_block_strip", "lsh_bucket_stats",
    "frequent_ngrams", "lm_corpus_blocks", "agentic_routed_fanout",
    "streaming_tumbling_equiv", "streaming_band_admission",
    "word_block_dedup", "q6_forecast_revenue",
    "join_dims_broadcast", "join_semi_anti", "window_rank_orders",
    "window_lag_running", "set_operations", "scope_projection",
    "low_length_filter", "group_counts", "distribution_fractions",
    "exact_dedup_first", "dedup_multi_key", "batch_assignment",
    "capped_group_sample", "seeded_shuffle_head", "grouped_split",
    "minhash_signatures", "minhash_lsh_dedup", "simhash_exact_dedup",
    "simhash_fingerprints", "ngram_jaccard_pairs", "jaccard_pairs_lsh",
    "near_dup_components", "embedding_near_dup", "similarity_brute_topk",
    "token_quality_stats", "language_quality", "cluster_best_survivor",
    "weighted_corpus_sample", "sequence_packing", "greedy_packing",
    "corpus_prep_pipeline", "doc_fingerprints", "chatml_flatten",
    "asof_join_purchases",
    # r6-new operators displace the last three r4-recorded backfill slots
    # (range_join_events, judge_metrics, cost_estimate — all r4-gated +
    # ORACLE_FULL green): new code earns the driver record first.
    "quality_classifier", "perplexity_buckets", "semantic_dedup",
)


def _rotated(mapping: dict) -> dict:
    head = [n for n in _GATE_FIRST if n in mapping]
    return {n: mapping[n] for n in head} | {
        n: v for n, v in mapping.items() if n not in set(head)
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from instructionspipe_spark.registry import QUERIES

    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from instructionspipe_spark.registry import ORACLES

    return _rotated(dict(ORACLES))
