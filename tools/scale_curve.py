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
# doc_id/vec_id, above the +10000 dupe-injection range the probe
# queries add)
KEY_OFFSET = {
    "lineitem": ("l_orderkey", 1_000_000),
    "customer": ("c_custkey", 10_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    # events (round-15, the event/window family): offsetting user_id
    # scales USERS linearly at constant per-user depth — what a real
    # bigger product does — and event_id gets the same offset to stay
    # unique (it is a window tie-break key).  The DEEP axis (below) is
    # the opposite: same users, k-times-longer per-user history.
    "events": ("user_id", 10_000_000),
    # orders (round-15, the lakehouse family): offset far above the
    # +10M synthetic-insert range _q_cdc_apply adds to base keys, so
    # replica r's base keys never collide with replica r-1's inserts
    "orders": ("o_orderkey", 100_000_000),
}

# 35 days in nanoseconds (the sf0.1 events table spans 30 days): each
# deep replica extends every user's history past the previous replica,
# so per-user sessions/rows grow linearly without cross-replica merges.
_DEEP_SHIFT_NS = 35 * 86_400 * 1_000_000_000

# --- iterative graph-loop probes (round-14, VERDICT r13 #7) ----------
# The registry graph queries run on the 25-node nation ring+chord graph
# (constant at every SF), so scaled parquet cannot probe their loops.
# These build a parameterized graph directly: ring i—(i+1)%n plus
# Lehmer-hash chords i—(i*48271)%n at even i.  The hash chords make the
# graph expander-like (diameter O(log n)) so the frontier/convergence
# loops grow with DATA, not with topology length — a scaled plain ring
# would make sssp run Θ(n) rounds and measure the generator, not the
# plan (the same artifact class the docstring's alphabet-rotation note
# guards against).
GRAPH_BASE_NODES = 25_000


def _scaled_edges(spark, n: int):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    ring = nodes.select(
        F.col("node").alias("src"), ((F.col("node") + 1) % n).alias("dst")
    )
    chords = nodes.where(F.col("node") % 2 == 0).select(
        F.col("node").alias("src"), ((F.col("node") * 48271) % n).alias("dst")
    )
    return ring.unionByName(chords).where(F.col("src") != F.col("dst"))


def _graph_probes():
    from backend_spark.operators.graph import (
        k_truss,
        label_propagation,
        pagerank,
        shortest_paths,
    )

    return {
        "pagerank_loop": lambda spark, n: pagerank(
            _scaled_edges(spark, n), max_iter=20, tol=0.0
        ),
        "label_prop_loop": lambda spark, n: label_propagation(
            _scaled_edges(spark, n), n_rounds=5
        ),
        "sssp_loop": lambda spark, n: shortest_paths(
            _scaled_edges(spark, n), [0, n // 2]
        ),
        "k_truss_loop": lambda spark, n: k_truss(_scaled_edges(spark, n), k=3),
    }


# --- fuzzy-join probes (round-15) ---------------------------------
# join_fuzzy's FastSS deletion-neighborhood join was never scale-probed
# (its registry input is the 25-row nation dimension, constant in sf).
# Two axes, because the operator is asymmetric: the LEFT side's
# distinct keys explode deletion variants and shuffle; the DICTIONARY
# side explodes variants into a BROADCAST — so left growth probes the
# shuffle path and dict growth probes the broadcast ceiling.  Keys are
# 10-char sha1-hex prefixes (realistic token length, fully distinct);
# two thirds of left keys carry one deterministic edit (delete or
# substitute at a rotating position), so distance ∈ {0,1} matches
# exist for every row and the verify stage does real work.
FUZZY_LEFT_BASE = 100_000
FUZZY_DICT_BASE = 5_000


def _fuzzy_words(spark, n, alias):
    return spark.range(n).select(
        F.substring(F.sha1(F.col("id").cast("string")), 1, 10).alias(alias)
    )


def _fuzzy_left(spark, n_left, n_dict):
    base = spark.range(n_left).select(
        F.col("id"),
        F.substring(
            F.sha1((F.col("id") % n_dict).cast("string")), 1, 10
        ).alias("w"),
    )
    pos = (F.col("id") % 8 + 1).cast("int")  # edit position 1-8
    return base.select(
        "id",
        F.when(
            F.col("id") % 3 == 0,  # deletion
            F.concat(
                F.substring(F.col("w"), 1, pos - 1),
                F.col("w").substr(pos + 1, F.lit(10)),
            ),
        )
        .when(
            F.col("id") % 3 == 1,  # substitution ('z' is not hex)
            F.concat(
                F.substring(F.col("w"), 1, pos - 1),
                F.lit("z"),
                F.col("w").substr(pos + 1, F.lit(10)),
            ),
        )
        .otherwise(F.col("w"))  # exact
        .alias("key"),
    )


def _fuzzy_probes():
    from backend_spark.operators.joins import fuzzy_match

    return {
        # left axis: k x more distinct noisy keys, dictionary constant
        "fuzzy_left_scan": lambda spark, k: fuzzy_match(
            _fuzzy_left(spark, FUZZY_LEFT_BASE * k, FUZZY_DICT_BASE),
            _fuzzy_words(spark, FUZZY_DICT_BASE, "w"),
            "key",
            "w",
        ),
        # dict axis: k x more dictionary words (broadcast side), left constant
        "fuzzy_dict_scan": lambda spark, k: fuzzy_match(
            _fuzzy_left(spark, FUZZY_LEFT_BASE, FUZZY_DICT_BASE * k),
            _fuzzy_words(spark, FUZZY_DICT_BASE * k, "w"),
            "key",
            "w",
        ),
    }


def materialize(spark, k: int) -> str:
    """Write the x{k} tables; no-op if the directory already exists."""
    out = os.path.join(OUT_ROOT, f"x{k}")
    marker = os.path.join(out, "_DONE")
    os.makedirs(out, exist_ok=True)
    for name in ("lineitem", "customer", "documents", "nation", "embeddings", "events", "orders"):
        # per-table skip (not the marker alone): lets a new table join
        # the set without rebuilding the cached ones
        if os.path.exists(marker) and os.path.exists(
            os.path.join(out, f"{name}.parquet")
        ):
            continue
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
                if name == "events":
                    # second unique key; ts untouched (wide axis)
                    rep = rep.withColumn(
                        "event_id", F.col("event_id") + F.lit(r * 10_000_000)
                    )
                if name == "embeddings" and r > 0:
                    # per-replica deterministic jitter: a pure scalar
                    # multiple would leave cosine DIRECTION identical,
                    # so semdedup/ann would see every replica as an
                    # exact near-dup of its original — quadratic
                    # cross-replica pairs, a generator artifact (same
                    # lesson as the documents alphabet rotation)
                    rep = rep.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, i: (
                                x + F.sin(i.cast("double") * (r * 0.7 + 0.3)) * 0.2
                            ).cast("float"),
                        ),
                    )
                parts.append(rep)
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def materialize_deep(spark, k: int) -> str:
    """Write the deep{k} events table: SAME user_ids, k-times-longer
    per-user history (each replica time-shifted past the last).  This
    probes the event/window family's real 100 TB hazard — per-user
    window partitions that grow with history depth (a power user's
    year lands in ONE task under (key, order) windowing) — separately
    from the benign more-users axis."""
    out = os.path.join(OUT_ROOT, f"deep{k}")
    marker = os.path.join(out, "_DONE")
    os.makedirs(out, exist_ok=True)
    if not os.path.exists(marker):
        base = load_table(spark, SF_DIR, "events")
        ts_type = dict(base.dtypes)["ts"]
        parts = []
        for r in range(k):
            if ts_type in ("bigint", "long"):  # TIMESTAMP(NANOS) as long
                shifted = F.col("ts") + F.lit(r * _DEEP_SHIFT_NS)
            else:  # timestamp / timestamp_ntz
                shifted = F.col("ts") + F.expr(f"INTERVAL '{r * 35}' DAY")
            parts.append(
                base.withColumn(
                    "event_id", F.col("event_id") + F.lit(r * 10_000_000)
                ).withColumn("ts", shifted)
            )
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--queries", default=",".join(QUERIES))
    ap.add_argument(
        "--deep", action="store_true",
        help="events deep axis: same users, k-times-longer history",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    names = args.queries.split(",")
    if args.deep:
        # deep dirs materialize ONLY events.parquet; any other table
        # would fail mid-run after the materialization cost is paid
        _EVENT_QUERIES = {
            "sessionize", "session_stats", "attribution", "retention",
            "decay_agg", "cusum", "funnel", "win_agg",
        }
        non_event = [n for n in names if n not in _EVENT_QUERIES]
        if non_event:
            sys.exit(
                f"--deep materializes only the events table; these queries "
                f"read other tables: {non_event}.  Pass --queries from "
                f"{sorted(_EVENT_QUERIES)}"
            )

    spark = get_session("scale-curve")
    qs = entry_mod.queries()
    probes = {**_graph_probes(), **_fuzzy_probes()}
    results: dict[str, dict[int, float]] = {q: {} for q in names}

    for k in scales:
        needs_tables = any(q not in probes for q in names)
        if not needs_tables:
            sf_dir = None
        elif args.deep:
            sf_dir = materialize_deep(spark, k)
        else:
            sf_dir = materialize(spark, k)
        for q in names:
            if q in probes:
                arg = k if q.startswith("fuzzy_") else GRAPH_BASE_NODES * k
                build = lambda: probes[q](spark, arg)  # noqa: E731
            else:
                build = lambda: qs[q](spark, sf_dir)  # noqa: E731
            build().write.format("noop").mode("overwrite").save()  # warm
            runs = []
            for _ in range(args.n):
                t0 = time.time()
                build().write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            med = round(statistics.median(runs), 3)
            results[q][k] = med
            print(f"x{k} {q}: {med}s  runs={[round(r, 2) for r in runs]}", file=sys.stderr)

    hdr = (
        "| query | "
        + " | ".join(f"x{k}" for k in scales)
        + f" | x{scales[-1]}/x{scales[0]} | per-row ratio |"
    )
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
