"""Seeded mini-fuzzer: random queries from an ANSI-common grammar run
through Spark SQL AND DuckDB verbatim, results compared — a lightweight
sqllogictest (SURVEY.md §5: the reference has nothing like this).

Grammar deliberately avoids engine-divergent territory: integer/exact
columns only, COUNT/MIN/MAX (no float sums), no LIMIT without ORDER BY.
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import assert_df_equal

TABLES = {
    "orders": {
        "group_cols": ["o_orderstatus", "o_orderpriority"],
        "int_cols": ["o_custkey", "o_orderkey"],
        "filter_cols": [("o_custkey", 0, 15000)],
    },
    "lineitem": {
        "group_cols": ["l_returnflag", "l_linestatus"],
        "int_cols": ["l_orderkey", "l_linenumber", "l_quantity"],
        "filter_cols": [("l_linenumber", 1, 7), ("l_orderkey", 0, 600000)],
    },
    "events": {
        "group_cols": ["event_type"],
        "int_cols": ["user_id", "event_id"],
        "filter_cols": [("user_id", 0, 150)],
    },
}

OPS = ["<", "<=", ">", ">=", "="]


def gen_query(rng: random.Random) -> str:
    table = rng.choice(list(TABLES))
    spec = TABLES[table]
    gcols = rng.sample(spec["group_cols"], rng.randint(1, len(spec["group_cols"])))
    aggs = ["COUNT(*) AS cnt"]
    for c in rng.sample(spec["int_cols"], rng.randint(1, 2)):
        fn = rng.choice(["MIN", "MAX", "COUNT"])
        aggs.append(f"{fn}({c}) AS {fn.lower()}_{c}")
    sql = f"SELECT {', '.join(gcols)}, {', '.join(aggs)} FROM {table}"
    if rng.random() < 0.8:
        col, lo, hi = rng.choice(spec["filter_cols"])
        op = rng.choice(OPS)
        val = rng.randint(lo, hi)
        sql += f" WHERE {col} {op} {val}"
        if rng.random() < 0.3:
            col2, lo2, hi2 = rng.choice(spec["filter_cols"])
            sql += f" {rng.choice(['AND', 'OR'])} {col2} {rng.choice(OPS)} {rng.randint(lo2, hi2)}"
    sql += f" GROUP BY {', '.join(gcols)}"
    if rng.random() < 0.4:
        sql += " HAVING COUNT(*) > 1"
    return sql


@pytest.mark.parametrize("seed", range(8))
def test_random_query_matches_duckdb(spark, tables, duck, seed):
    from instructionspipe_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    rng = random.Random(1000 + seed)
    for _ in range(5):
        sql = gen_query(rng)
        assert_df_equal(spark.sql(sql), duck.query(sql)), sql
