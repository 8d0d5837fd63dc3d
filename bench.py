"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (df.count() would
let Catalyst prune the projections we mean to measure).

Since round 9 each query is timed ``RUNS`` times after the warm run and
``queries`` reports the per-query MEDIAN (``value`` is the sum of those
medians).  Rounds 5-8 each burned a judge/builder cycle adjudicating
single-run sub-second drift on a loaded machine; medians absorb it.
``wall_s`` is the raw wall-clock of the whole timing loop (all runs,
warmups included) for anyone who wants the old single-number view.

Since round 10 a SECOND suite (``suite2`` / ``suite2_value``) tracks
ten round-9-era operator families (CDC, drift tests, cascade matching,
ridge, attribution, session analytics, ER, compaction, Fellegi-Sunter,
dup reporting).  Suite-2 timings REBUILD the query each run and time
construction + execution together: several of these run eager
driver-coordinated stages at build time (ridge's moment solve, fs_em's
EM iterations, er_pipeline's CC loop), which the suite-1 protocol —
timing the second noop save of one built DataFrame — would miss
entirely (the bpe_train exclusion note below).  The two suites are
therefore NOT comparable to each other; suite 1 keeps its round-3
protocol for cross-round comparability.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

RUNS = 3
# per-query overrides: dup_report's median-of-3 swings 6.3-8.0s
# between identical runs (BENCH_NOTES rounds 10-12; the r12 anatomy
# puts the cost in the md5/shingle signature stage + fixed per-round
# CC overhead, and the swing in JVM/GC variance across its ~30 jobs);
# extra samples tighten its median without slowing the whole suite
EXTRA_RUNS = {"dup_report": 7}

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from backend_spark.session import get_session

HEADLINE = [
    "groupby_agg",
    "eval_tier1",
    "join_strict",
    "join_fuzzy",
    "join_topk",
    "normalize",
    "win_agg",
    "dedup_exact",
    "minhash_sig",
    "simhash",
    "simhash_neardup",
    "fingerprint",
    "ann_topk",
    "text_stats",
    "clique",
    "recipe_pipeline",
    # LLM-pipeline hygiene ops (round 4)
    "pii_scan",
    "decontaminate",
    "repetition_stats",
    "sessionize",
    # engine ops (round 4, late)
    "range_join",
    "compact_latest",
    "bm25_topk",
    "profile",
    # round 5 graph kernel (bpe_train is excluded: its merge loop runs
    # eagerly at query construction, so this harness — which times the
    # second noop save of one built DataFrame, checkpoint reuse and all,
    # comparably with rounds 1-4 — would measure only its result save)
    "square_clustering",
]

# round-9-era representatives (round-10 verdict #3) — construction is
# timed (see module docstring); one per new operator family
SUITE2 = [
    "cdc_apply",
    "ks_test",
    "match_cascade",
    "ridge_train",
    "attribution",
    "session_stats",
    "er_pipeline",
    "compaction_plan",
    "fs_em",
    "dup_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")
    qs = entry_mod.queries()

    wall0 = time.time()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan + JIT + cache)
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)

    suite2: dict[str, float] = {}
    for name in SUITE2:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(EXTRA_RUNS.get(name, RUNS)):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        suite2[name] = round(statistics.median(samples), 3)
    wall_s = round(time.time() - wall0, 3)

    total = round(sum(timings.values()), 3)
    # the original 16-query subtotal, comparable across rounds (the
    # suite grows as operators land; `value` covers everything)
    r3_subtotal = round(sum(timings[n] for n in HEADLINE[:16]), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "headline16": r3_subtotal,
                "suite2_value": round(sum(suite2.values()), 3),
                "runs_per_query": RUNS,
                "wall_s": wall_s,
                "queries": timings,
                "suite2": suite2,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
