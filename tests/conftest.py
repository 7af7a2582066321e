"""Shared pytest fixtures: one SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instructionspipe_spark import get_spark, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ips-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same parquet tables registered as views —
    the differential-test oracle (SURVEY.md §5)."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def assert_df_equal(spark_df, duck_rel, float_tol=1e-9):
    """Order-insensitive comparison of a Spark DataFrame against a DuckDB
    relation: sorted column names, sorted rows, per-value equality with
    float tolerance — a strictly stricter local version of the driver's
    value-hash check."""
    import math

    import pandas as pd

    sp = spark_df.toPandas()
    dk = duck_rel.df() if hasattr(duck_rel, "df") else duck_rel
    assert sorted(sp.columns) == sorted(dk.columns), f"columns differ: {sorted(sp.columns)} vs {sorted(dk.columns)}"
    cols = sorted(sp.columns)
    sp = sp[cols]
    dk = dk[cols]
    assert len(sp) == len(dk), f"row counts differ: {len(sp)} vs {len(dk)}"

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, pd.Timestamp):
            return v.tz_localize(None) if v.tzinfo else v
        return v

    sp_rows = sorted([tuple(norm(v) for v in row) for row in sp.itertuples(index=False)], key=repr)
    dk_rows = sorted([tuple(norm(v) for v in row) for row in dk.itertuples(index=False)], key=repr)
    for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= float_tol * max(1.0, abs(x), abs(y)), f"row {i}: {a} vs {b}"
            else:
                assert x == y, f"row {i}: {a} != {b}"
