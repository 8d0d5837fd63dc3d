"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and diff it against ``oracle_sql()``
via DuckDB (row count, sorted column names, order-insensitive values).

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from backend_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(df):
    """pandas frame -> sorted-by-name columns, canonical value matrix."""
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        if isinstance(v, (list, tuple, np.ndarray)):
            return tuple(cell(x) for x in v)
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
            return v
        return v

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr), list(df.columns)


def main(only=None, vanilla=False):
    if vanilla:
        # mimic the driver's harness: a plain session with none of the
        # repo's confs, so queries() must work on any SparkSession.
        # getOrCreate() reuses any live session (with repo confs still
        # applied), which would make this check a silent no-op — stop it.
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None, (
            "vanilla session unexpectedly carries repo confs"
        )
    else:
        spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q(spark, SF_DIR).toPandas()
        except Exception as e:
            results[name] = f"SPARK-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)"
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        srows, scols = _canon(sdf)
        orows, ocols = _canon(odf)
        if scols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"COUNT-MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
            )
            results[name] = f"VALUE-MISMATCH at sorted row {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}"
        else:
            results[name] = f"OK ({len(srows)} rows, {time.time()-t0:.1f}s)"

    ok = sum(1 for v in results.values() if v.startswith("OK"))
    ro = sum(1 for v in results.values() if v.startswith("rows-only"))
    for name, v in results.items():
        mark = "✓" if v.startswith(("OK", "rows-only")) else "✗"
        print(f"{mark} {name:20s} {v}")
    print(f"\n{ok} OK + {ro} rows-only / {len(results)} checked")
    return 0 if ok + ro == len(results) else 1


if __name__ == "__main__":
    argv = sys.argv[1:]
    vanilla = "--vanilla" in argv
    names = {a for a in argv if a != "--vanilla"}
    sys.exit(main(names or None, vanilla=vanilla))
