"""Local replica of the driver's DuckDB correctness gate.

Runs every ``queries()`` entry at the given sf dir via Spark and its
``oracle_sql()`` twin via DuckDB, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from geminigraph_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        got = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"  {name}: rows={len(got)} (no oracle, rows-only) {t1-t0:.1f}s")
            if len(got) == 0:
                failures.append((name, "zero rows"))
            continue
        want = con.execute(oracles[name]).fetchdf()
        t2 = time.time()
        ok, msg = compare(got, want)
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} rows={len(got)} spark={t1-t0:.1f}s duck={t2-t1:.1f}s {msg}")
        if not ok:
            failures.append((name, msg))
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


def compare(got: pd.DataFrame, want: pd.DataFrame) -> tuple[bool, str]:
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"schema {gc} vs {wc}"
    if len(got) != len(want):
        return False, f"rowcount {len(got)} vs {len(want)}"
    g = got[gc].sort_values(gc).reset_index(drop=True)
    w = want[wc].sort_values(wc).reset_index(drop=True)
    for c in gc:
        gv, wv = g[c], w[c]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            import numpy as np

            if not np.allclose(gv.values.astype(float), wv.values.astype(float), atol=1e-9):
                return False, f"float col {c} mismatch"
        else:
            if not (gv.values == wv.values).all():
                bad = (gv.values != wv.values).nonzero()[0][:5]
                return False, f"col {c} mismatch at rows {bad}: {gv.values[bad]} vs {wv.values[bad]}"
    return True, ""


if __name__ == "__main__":
    sys.exit(main())
