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


JOINS = [
    # (left, right, cond, left group col, right-side int col)
    ("orders", "lineitem", "o.o_orderkey = l.l_orderkey", "o.o_orderpriority", "l.l_linenumber"),
    ("customer", "orders", "c.c_custkey = o.o_custkey", "c.c_mktsegment", "o.o_orderkey"),
    ("events", "events", "a.user_id = b.user_id AND a.event_id < b.event_id", "a.event_type", "b.event_id"),
]


def gen_join_query(rng: random.Random) -> str:
    left, right, cond, gcol, icol = rng.choice(JOINS)
    la, ra = cond.split(".")[0], cond.split(" = ")[1].split(".")[0]
    kind = rng.choice(["JOIN", "JOIN", "EXISTS", "NOT EXISTS"])
    if kind in ("EXISTS", "NOT EXISTS"):
        # semi/anti join spelled as (NOT) EXISTS — identical syntax in both
        # engines (DuckDB's SEMI JOIN spelling differs from Spark's).
        gc = gcol.replace("a.", f"{la}.")
        sql = (
            f"SELECT {gc}, COUNT(*) AS cnt FROM {left} {la} "
            f"WHERE {kind} (SELECT 1 FROM {right} {ra} WHERE {cond}) "
            f"GROUP BY {gc}"
        )
    else:
        fn = rng.choice(["MIN", "MAX", "COUNT"])
        sql = (
            f"SELECT {gcol}, COUNT(*) AS cnt, {fn}({icol}) AS agg2 "
            f"FROM {left} {la} JOIN {right} {ra} ON {cond} GROUP BY {gcol}"
        )
    if rng.random() < 0.5 and " WHERE " not in sql:
        sql = sql.replace(" GROUP BY", f" WHERE {gcol} IS NOT NULL GROUP BY")
    return sql


@pytest.mark.parametrize("seed", range(6))
def test_random_join_query_matches_duckdb(spark, tables, duck, seed):
    """Join-grammar differential fuzz: inner/semi/anti equi-joins (incl. a
    theta self-join) through Spark SQL and DuckDB verbatim."""
    from instructionspipe_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    rng = random.Random(7000 + seed)
    for _ in range(4):
        sql = gen_join_query(rng)
        try:
            assert_df_equal(spark.sql(sql), duck.query(sql))
        except AssertionError as e:
            raise AssertionError(f"divergence on: {sql}\n{e}") from e
