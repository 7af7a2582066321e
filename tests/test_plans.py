"""Plan-quality regression tests: the physical plans we designed for must
stay the plans Catalyst picks (SCALE.md 'verified plan properties')."""

from __future__ import annotations

import contextlib
import io
import os

import __spark_entry__ as entrymod

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q5_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4  # all dims broadcast
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in plan


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    # column pruning: never reads unused lineitem columns
    assert "l_comment" not in plan and "l_partkey" not in plan
    assert "HashAggregate" in plan


def test_instructions_pipeline_is_shuffle_free(spark):
    plan = _plan(spark, "instructions_mapreduce")
    # map + reduce operate on the same row: the whole pipeline is one narrow
    # stage over the scan; AQE may add a trailing exchange only for writes
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_scope_projection_prunes_scan(spark):
    plan = _plan(spark, "scope_projection")
    assert "text" in plan and "n_chars" not in plan  # unused col pruned


def test_cached_completions_no_crossjoin(spark):
    plan = _plan(spark, "cached_completions")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q6_all_predicates_push_to_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    for frag in ("GreaterThanOrEqual(l_shipdate", "GreaterThanOrEqual(l_discount",
                 "LessThanOrEqual(l_discount", "LessThan(l_quantity"):
        assert frag in plan, f"missing pushed filter {frag}"
    # only the four referenced columns are read
    assert "l_extendedprice" in plan and "l_comment" not in plan and "l_partkey" not in plan


def test_q14_q18_broadcast_small_sides(spark):
    p14 = _plan(spark, "q14_promo_ratio")
    assert "BroadcastHashJoin" in p14 and "SortMergeJoin" not in p14
    p18 = _plan(spark, "q18_large_orders")
    assert "BroadcastHashJoin" in p18
    assert "TakeOrderedAndProject" in p18  # top-20 never global-sorts


def test_q4_semi_q22_anti_join_types(spark):
    assert "LeftSemi" in _plan(spark, "q4_priority_exists")
    assert "LeftAnti" in _plan(spark, "q22_dormant_customers")
