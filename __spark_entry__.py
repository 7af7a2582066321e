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
# entries of queries(). Round-7 priority order (VERDICT_r6 "Next round" #2:
# rotate onto the stalest records; every registry query has been gated at
# least once, so priority = never-gated new rows, then oldest gate record):
# 1. The NINE new r7 queries: the trained-mode (KMeans) recall contracts
#    (ivfadc_trained_recall, pq_trained_recall, semantic_dedup_trained —
#    VERDICT item 1) and the three new streaming twins
#    (streaming_sliding_equiv, streaming_session_equiv,
#    streaming_late_drop_equiv — VERDICT item 4) plus the stateful
#    cross-batch dedup twin (streaming_dedup_equiv), the foreachBatch
#    LLM-cache twin (streaming_llm_cache_equiv — the row that caught the
#    ReuseExchange cache bug), and the applyInPandasWithState custom
#    stateful operator twin (streaming_stateful_counts_equiv).
# 2. The FIFTEEN queries whose newest gate record is r4 — the full
#    r4-or-older set, verified against the r1-r6 CORRECTNESS union.
# 3. Backfill: 26 of the 49 r5-gated queries (LLM family, similarity
#    family, TPC-H mid-family). The 23 r5-gated rows left out
#    (grouping_sets_revenue, percentile_order_value, pivot_event_matrix,
#    q8_market_share, window_moving_avg,
#    q10/q15/q17, date_arithmetic, variant_json_extract, join_full_outer,
#    unpivot_metrics, the textstats cohort) are exactly two rounds old
#    after r7 and lead the r8 rotation.
_GATE_FIRST = (
    # -- new this round ----------------------------------------------------
    "ivfadc_trained_recall", "pq_trained_recall", "semantic_dedup_trained",
    "streaming_sliding_equiv", "streaming_session_equiv",
    "streaming_late_drop_equiv", "streaming_dedup_equiv",
    "streaming_llm_cache_equiv", "streaming_stateful_counts_equiv",
    # -- stalest: last gated r4 --------------------------------------------
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "agg_rollup", "agg_distinct", "agg_cube", "cross_corpus_near_dups",
    "cache_keys", "range_join_events", "tumbling_window_agg",
    "judge_metrics", "cost_estimate", "instructions_mapreduce",
    "session_windows", "sliding_windows",
    # -- r5-gated backfill -------------------------------------------------
    "bpe_token_counts", "lm_block_manifest", "approx_distinct",
    "self_verification", "constrained_json_parse", "tag_extraction",
    "media_features", "chatml_family_adjust", "cached_completions",
    "judge_fanout_ensemble", "grpo_reward_advantage", "hash_split_counts",
    "similarity_multitable_topk", "similarity_lsh_multiprobe",
    "similarity_lsh_topk", "agentic_fanout", "similarity_ivf_topk",
    "q14_promo_ratio", "q18_large_orders", "salted_aggregate",
    "q4_priority_exists", "q13_customer_distribution",
    "q19_disjunctive_revenue", "q22_dormant_customers", "simhash_near_dedup",
    "q7_nation_trade",
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
