"""Empirical scale-curve probe (VERDICT r12 #6): self-union the sf0.1
tables x{1,2,4,8} and time headline queries at each size, converting
the "plans right at 100x" design claims into measured wall-time growth.

Replication is NOT a naive union — that would measure generator
artifacts, not plans:

* key columns get a per-replica offset (l_orderkey, c_custkey, doc_id)
  so join/group cardinalities scale linearly instead of fanning out
  quadratically on duplicated keys;
* document text gets a per-replica ALPHABET ROTATION (``F.translate``
  with a Caesar-shifted a-z/A-Z map) so replicas share no character
  shingles at all — the corpus's internal duplicate structure
  replicates per-copy and true-pair counts grow linearly, which is
  what a real x8 corpus does.  (A word-suffix salt is NOT enough:
  ``llm.shingles`` are character n-grams, so suffixed replicas stay
  ~80% Jaccard-similar and cross-replica LSH pairs grow
  quadratically — measured 3.4x wall at x2 before the fix, a
  generator artifact, not a plan property.)  Rotation keeps text
  length, token boundaries and per-row work identical;
* dimension tables (nation) are copied unscaled — dimensions don't
  grow with the fact tables at 100 TB either.

Queries probed (suite-2 rebuild protocol — construction + execution
timed, median of N): groupby_agg (lineitem agg), simhash_neardup +
dedup_near + dup_report (documents near-dup family: banding, CC loop,
histogram), er_pipeline (customer ER flagship).  join_fuzzy from the
verdict's candidate list is SKIPPED: its probe input is the 25-row
nation dimension, constant in sf.

Usage: python tools/scale_curve.py [-n 3] [--scales 1,2,4,8]
Prints one markdown table + one JSON line; scaled parquet is
materialized under /tmp/sg_scale_curve (reused if present).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from backend_spark.session import get_session, load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/sg_scale_curve"
QUERIES = ["groupby_agg", "simhash_neardup", "dedup_near", "dup_report", "er_pipeline"]

# per-replica key offsets chosen far above the sf0.1 max keys (and, for
# doc_id, above the +10000 dupe-injection range the probe queries add)
KEY_OFFSET = {
    "lineitem": ("l_orderkey", 1_000_000),
    "customer": ("c_custkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
}


def materialize(spark, k: int) -> str:
    """Write the x{k} tables; no-op if the directory already exists."""
    out = os.path.join(OUT_ROOT, f"x{k}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for name in ("lineitem", "customer", "documents", "nation"):
        base = load_table(spark, SF_DIR, name)
        if name == "nation":
            scaled = base  # dimension: unscaled
        else:
            key, off = KEY_OFFSET[name]
            parts = []
            for r in range(k):
                rep = base.withColumn(key, F.col(key) + F.lit(r * off))
                if name == "documents" and r > 0:
                    lo = "abcdefghijklmnopqrstuvwxyz"
                    hi = lo.upper()
                    rot = lo[r:] + lo[:r]
                    rep = rep.withColumn(
                        "text", F.translate("text", lo + hi, rot + rot.upper())
                    )
                parts.append(rep)
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    names = args.queries.split(",")

    spark = get_session("scale-curve")
    qs = entry_mod.queries()
    results: dict[str, dict[int, float]] = {q: {} for q in names}

    for k in scales:
        sf_dir = materialize(spark, k)
        for q in names:
            qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            runs = []
            for _ in range(args.n):
                t0 = time.time()
                qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            med = round(statistics.median(runs), 3)
            results[q][k] = med
            print(f"x{k} {q}: {med}s  runs={[round(r, 2) for r in runs]}", file=sys.stderr)

    hdr = "| query | " + " | ".join(f"x{k}" for k in scales) + " | x8/x1 | per-row ratio |"
    sep = "|---" * (len(scales) + 3) + "|"
    lines = [hdr, sep]
    for q in names:
        row = results[q]
        hi, lo = scales[-1], scales[0]
        growth = round(row[hi] / row[lo], 2) if row[lo] else float("nan")
        per_row = round(growth / (hi / lo), 2)
        cells = " | ".join(f"{row[k]:.3f}" for k in scales)
        lines.append(f"| `{q}` | {cells} | {growth}x | {per_row} |")
    print("\n".join(lines))
    print(json.dumps({"n": args.n, "sf_dir": SF_DIR, "scales": scales, "timings": results}))


if __name__ == "__main__":
    main()
