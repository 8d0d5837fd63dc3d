"""Repeated-timing harness for settling bench regressions (VERDICT r5
task #4): runs each named query N times end-to-end (noop sink, same
shape as bench.py) and prints min/median/max per query, so one noisy
run can't convict or acquit a sub-second query.

Usage: python tools/bench_repeat.py [-n 5] [--rebuild] [query ...]
Defaults to the r5-flagged trio join_topk, join_fuzzy, normalize plus
join_strict as an unchanged-code control.

``--rebuild`` switches to the bench.py suite-2 protocol: the query is
REBUILT each run and construction + execution are timed together.
Required for queries that run eager driver-coordinated stages at build
time (ridge's moment solve, dup_report's CC loop, fs_em) — the default
built-once protocol would time only the final result save for those.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from backend_spark.session import get_session

DEFAULT = ["join_topk", "join_fuzzy", "normalize", "join_strict"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()
    names = args.queries or DEFAULT

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench-repeat")
    qs = entry_mod.queries()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        if args.rebuild:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            runs = []
            for _ in range(args.n):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
        else:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            runs = []
            for _ in range(args.n):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
        out[name] = {
            "min": round(min(runs), 3),
            "median": round(statistics.median(runs), 3),
            "max": round(max(runs), 3),
            "runs": [round(r, 3) for r in runs],
        }
        print(f"{name}: {out[name]}", file=sys.stderr)

    print(json.dumps({"n": args.n, "sf_dir": sf_dir, "timings": out}))


if __name__ == "__main__":
    main()
