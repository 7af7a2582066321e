"""Differential harness: run every registry query on Spark AND its DuckDB
oracle, compare row count, schema (sorted column names) and order-insensitive
values — a local replica of the driver's correctness gate.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(v):
    import datetime

    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return round(v, 6)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(normalize(x) for x in v)
        if isinstance(v, np.generic):
            return normalize(v.item())
    except ImportError:
        pass
    return v


def frame_fingerprint(df):
    cols = sorted(df.columns)
    rows = sorted(
        (tuple(normalize(v) for v in row) for row in df[cols].itertuples(index=False)),
        key=repr,
    )
    return cols, rows


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # VANILLA session on purpose: the driver's gate runs a bare
    # SparkSession, so every query must be self-sufficient (no reliance on
    # get_spark()'s confs). Round-1 lost 13 rows to exactly that gap.
    import os

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]").appName("oracle-check").getOrCreate()
    )
    con = duckdb.connect()

    for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            continue
        scols, srows = frame_fingerprint(sdf)
        dcols, drows = frame_fingerprint(ddf)
        if scols != dcols:
            failures.append(name)
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: first diff at sorted-row {bad[0]}:\n  spark {bad[1]}\n  duck  {bad[2]}")
        else:
            print(f"OK   {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(queries) - len(failures)}/{len([q for q in queries if not only or q in only])} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
