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


_SPARK_DTYPE = {
    "tinyint": "int8", "smallint": "int16", "int": "int32", "bigint": "int64",
    "float": "float32", "double": "float64", "string": "string",
    "boolean": "bool", "date": "date", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp", "binary": "binary", "void": "null",
}

_DUCK_DTYPE = {
    "tinyint": "int8", "smallint": "int16", "integer": "int32", "bigint": "int64",
    "utinyint": "uint8", "usmallint": "uint16", "uinteger": "uint32",
    "ubigint": "uint64", "hugeint": "int128",  # int128 never matches Spark -> flagged
    "float": "float32", "double": "float64", "varchar": "string", "json": "string",
    "boolean": "bool", "date": "date", "blob": "binary", '"null"': "null",
}


def _canon_spark_type(t):
    t = t.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{_canon_spark_type(t[6:-1])}>"
    if t.startswith("decimal"):
        return "decimal"  # flagged: oracles should cast to BIGINT/DOUBLE
    if t.startswith("map<") or t.startswith("struct<"):
        return t  # compared verbatim; DuckDB side rarely produces these
    return _SPARK_DTYPE.get(t, t)


def _canon_duck_type(t):
    t = str(t).strip().lower()
    if t.endswith("[]"):
        return f"list<{_canon_duck_type(t[:-2])}>"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):  # with/without tz, _s/_ms/_ns
        return "timestamp"
    return _DUCK_DTYPE.get(t, t)


def _dtype_diff(spark_dtypes, duck_cols, duck_types):
    """Return list of per-column canonical dtype mismatches (name, spark, duck)."""
    s = {name: _canon_spark_type(t) for name, t in spark_dtypes}
    d = {name: _canon_duck_type(t) for name, t in zip(duck_cols, duck_types)}
    return [
        (name, s[name], d[name])
        for name in sorted(set(s) & set(d))
        if s[name] != d[name]
    ]


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
            sdf_spark = q(spark, SF_DIR)
            spark_dtypes = sdf_spark.dtypes
            sdf = sdf_spark.toPandas()
        except Exception as e:
            results[name] = f"SPARK-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        # The driver's canonicalizer (pandas sort_values -> factorize)
        # cannot sort list/struct/map cells — it dies with "unhashable
        # type" on any non-scalar column.  _canon below is MORE
        # permissive (repr-sort handles lists), so mirror the driver
        # here: demand to_json on complex columns before they leave a
        # query.  (r6 post-mortem: bpe_encode shipped a raw
        # array<string> that only the driver could catch.)
        complex_cols = [
            (c, t) for c, t in spark_dtypes
            if t.startswith(("array", "struct", "map"))
        ]
        if complex_cols:
            results[name] = (
                "NON-SCALAR-COLUMN (driver canon cannot sort; wrap in F.to_json): "
                + ", ".join(f"{c}: {t}" for c, t in complex_cols)
            )
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)"
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols, duck_types = rel.columns, rel.types
            odf = rel.df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}"
            continue
        # The driver's value hash is dtype-sensitive (Arrow), so a
        # numerically-equal int128/int64 pair still reds out — catch it here.
        dt = _dtype_diff(spark_dtypes, duck_cols, duck_types)
        if dt:
            results[name] = "DTYPE-MISMATCH " + ", ".join(
                f"{c}: spark={s} oracle={d}" for c, s, d in dt
            )
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
