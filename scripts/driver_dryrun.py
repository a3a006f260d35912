#!/usr/bin/env python
"""Simulate the driver's verification: entry() smoke, every queries() entry
at sf0.01, DuckDB oracle comparison (row count, sorted-column schema,
order-insensitive values) for every oracle_sql() entry. Plain vanilla session
(no engine defaults) to match the driver environment."""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
from pyspark.sql import SparkSession

# override with SPARK_GRAFT_DRYRUN_SF for the oracle-probe generalization
# sweep (e.g. sf0.001 — a second corpus catches memorized-answer oracles)
SF_DIR = os.environ.get("SPARK_GRAFT_DRYRUN_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF_DIR}/{t}.parquet')")

    import __spark_entry__ as E
    failures = []

    t0 = time.time()
    rows = E.entry(spark).collect()
    print(f"entry: {len(rows)} rows in {time.time() - t0:.1f}s "
          f"{'OK' if rows else 'EMPTY!'}")
    if not rows:
        failures.append("entry")

    qs, os_ = E.queries(), E.oracle_sql()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SPARK FAIL {exc}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"{name}: {len(got)} rows (rows-only) {time.time()-t0:.1f}s")
            if len(got) == 0 and name != "simhash_pairs":
                failures.append(f"{name} (0 rows)")
            continue
        try:
            want = con.execute(os_[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE SQL FAIL {exc}")
            failures.append(name)
            continue
        g = got[sorted(got.columns)].sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        w = want[sorted(want.columns)].sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        ok = list(g.columns) == list(w.columns) and len(g) == len(w)
        if ok:
            for c in g.columns:
                if np.issubdtype(g[c].dtype, np.floating) \
                        or np.issubdtype(w[c].dtype, np.floating):
                    ok = ok and np.array_equal(g[c].to_numpy(), w[c].to_numpy())
                else:
                    ok = ok and g[c].astype(object).tolist() == \
                        w[c].astype(object).tolist()
        status = "MATCH" if ok else "MISMATCH"
        print(f"{name}: {len(g)} rows vs {len(w)} — {status} {time.time()-t0:.1f}s")
        if not ok:
            failures.append(name)

    print(f"\n{len(qs)} queries, {len(os_)} oracles, failures: {failures or 'none'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
