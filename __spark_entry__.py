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
# entries of queries(). Round-10 priority order (VERDICT_r9 "Next round" #1,
# derived mechanically from the CORRECTNESS_r01-r09 union — see
# tools/gate_fingerprints.py for the companion changed-since-last-gate
# enforcement):
# 1. The THREE rows never driver-gated (new in r10: the scale-safe capped
#    shapes of N24 and the decontamination join, plus SemDeDup's
#    hierarchical-assignment twin — incremental_batch_dedup_capped,
#    cross_corpus_near_dups_capped, semantic_dedup_two_level).
# 2. The ELEVEN rows whose newest gate record is r6 (the spill the r9
#    head documented).
# 3. The THREE rows whose oracle text was edited by the r9 decimal sweep
#    AFTER their newest gate record (judge_metrics, cost_estimate,
#    repetition_stats; distribution_fractions is already in cohort 2) —
#    the class QUERY_FINGERPRINTS.json now catches mechanically.
# 4. THIRTY-THREE of the remaining 46 r7-stale rows, in registry order.
# Structural note: with 160 registry queries and a 50-row window, full
# coverage takes ceil(160/50) = 4 rounds; the 13 r7 rows spilled past the
# window below lead r11, and ALL rows are re-verified this round in the
# builder's own 3-SF ORACLE_FULL_r10 record.
_GATE_FIRST = (
    # -- never driver-gated (new in r10) ------------------------------------
    "incremental_batch_dedup_capped", "cross_corpus_near_dups_capped",
    "semantic_dedup_two_level",
    # -- r6-stale cohort (the 11 rows spilled by the r9 head) ----------------
    "scope_projection", "low_length_filter", "set_operations",
    "window_rank_orders", "window_lag_running", "exact_dedup_first",
    "batch_assignment", "seeded_shuffle_head", "capped_group_sample",
    "grouped_split", "distribution_fractions",
    # -- oracle text changed post-gate by the r9 decimal sweep ---------------
    "judge_metrics", "cost_estimate", "repetition_stats",
    # -- r7-stale cohort (35 of 46, registry order) --------------------------
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "agg_rollup", "agg_distinct", "cache_keys", "range_join_events",
    "tumbling_window_agg", "instructions_mapreduce", "session_windows",
    "sliding_windows", "agg_cube", "approx_distinct", "self_verification",
    "tag_extraction", "media_features", "chatml_family_adjust",
    "cached_completions", "judge_fanout_ensemble", "hash_split_counts",
    "similarity_lsh_topk", "agentic_fanout", "similarity_ivf_topk",
    "q14_promo_ratio", "q18_large_orders", "cross_corpus_near_dups",
    "bpe_token_counts", "constrained_json_parse", "grpo_reward_advantage",
    "similarity_lsh_multiprobe", "q4_priority_exists",
    "q13_customer_distribution", "q19_disjunctive_revenue",
    # ======================= 50-window boundary ============================
    # -- the 13 spilled r7 rows (7 of them the streaming twins, all
    #    re-verified at 3 SFs in ORACLE_FULL_r10): they lead r11 -----------
    "q22_dormant_customers", "salted_aggregate",
    "q7_nation_trade", "simhash_near_dedup", "similarity_multitable_topk",
    "lm_block_manifest", "semantic_dedup_trained",
    "streaming_sliding_equiv", "streaming_session_equiv",
    "streaming_late_drop_equiv", "streaming_dedup_equiv",
    "streaming_llm_cache_equiv", "streaming_stateful_counts_equiv",
)


def _rotated(mapping: dict) -> dict:
    # A typo or a renamed query in _GATE_FIRST would otherwise silently
    # shift the 50-row gate window — a query the comment claims is gated
    # would go ungated with no signal. Fail loudly instead.
    missing = [n for n in _GATE_FIRST if n not in mapping]
    if missing:
        raise ValueError(
            f"_GATE_FIRST names not in the registry (typo or renamed query "
            f"— fix the rotation list): {missing}"
        )
    head = list(_GATE_FIRST)
    return {n: mapping[n] for n in head} | {
        n: v for n, v in mapping.items() if n not in set(head)
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from instructionspipe_spark.registry import QUERIES

    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    from instructionspipe_spark.registry import ORACLES

    return _rotated(dict(ORACLES))
