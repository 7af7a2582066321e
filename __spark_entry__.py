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
# entries of queries(). Round-9 priority order (VERDICT_r8 "Next round" #3):
# 1. The SEVEN rows never driver-gated (all late-r8 additions).
# 2. The FOUR rows whose code or oracle changed in r9 and whose newest
#    gate record predates the change (q12's BIGINT oracle cast — the one
#    red r8 row; bm25's decimal score sum; the ivfadc/pq trained-contract
#    retunes m=8/rerank=400).
# 3. THIRTY-NINE of the 50 rows whose newest gate record is r6 (the
#    stalest cohort; the r1-r8 CORRECTNESS union was parsed mechanically
#    to derive it).
# Structural note: with 157 registry queries and a 50-row window, full
# coverage takes ceil(157/50) = 4 rounds, so a ≤7-row tail at 3 rounds
# stale is unavoidable; the 11 r6 rows spilled past the window below are
# the trivial relational ops benched every round, and ALL 157 rows are
# re-verified this round in the builder's own 3-SF ORACLE_FULL_r9 record
# (sf0.001 / sf0.01 / sf0.1).
_GATE_FIRST = (
    # -- never driver-gated (late r8) ---------------------------------------
    "zorder_multidim_scan", "streaming_cdc_equiv", "ivfsq_trained_recall",
    "funnel_windowed", "user_value_outliers", "event_transitions",
    "funnel_latency",
    # -- changed in r9, regate ----------------------------------------------
    "q12_late_priority_lines", "bm25_retrieval",
    "ivfadc_trained_recall", "pq_trained_recall",
    # -- r6-stale cohort (39 of 50) ------------------------------------------
    "group_counts", "join_dims_broadcast",  # also changed in r9 (decimal sums)
    "agentic_routed_fanout", "asof_join_purchases", "char_entropy_quality",
    "chatml_flatten", "cluster_best_survivor", "corpus_prep_pipeline",
    "dedup_multi_key", "doc_fingerprints", "embedding_near_dup",
    "frequent_ngrams", "greedy_packing", "incremental_batch_dedup",
    "jaccard_pairs_lsh", "join_semi_anti", "language_quality",
    "lm_corpus_blocks", "lsh_bucket_stats", "minhash_lsh_dedup",
    "minhash_signatures", "near_dup_components", "ngram_jaccard_pairs",
    "perplexity_buckets", "q6_forecast_revenue", "quality_classifier",
    "semantic_dedup", "sequence_packing", "simhash_exact_dedup",
    "simhash_fingerprints", "similarity_brute_topk",
    "similarity_ivfadc_topk", "similarity_pq_topk",
    "streaming_band_admission", "streaming_tumbling_equiv",
    "template_block_strip", "token_quality_stats", "weighted_corpus_sample",
    "word_block_dedup",
    # ======================= 50-window boundary ============================
    # -- the 11 spilled r6 rows: trivial relational ops, benched every
    #    round, re-verified at 3 SFs in ORACLE_FULL_r9; they lead r10 with
    #    the r7 cohort ------------------------------------------------------
    "scope_projection", "low_length_filter", "set_operations",
    "window_rank_orders", "window_lag_running", "exact_dedup_first",
    "batch_assignment", "seeded_shuffle_head", "capped_group_sample",
    "grouped_split", "distribution_fractions",
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
