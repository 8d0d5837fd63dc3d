"""Measure the persist-mode re-root's downstream plan cost vs local
mode (VERDICT r14, Next-round #6; caveat documented at ``scale.py``
stage()).

What the measurement actually found (round-15): the round-13 framing —
"persist mode loses ``outputPartitioning``" — is moot under AQE,
because EVERY checkpoint variant's plan root (``localCheckpoint``
included) reports ``UnknownPartitioning``: ``AdaptiveSparkPlanExec``
cannot promise a layout statically.  The real divergence was STATS:
the old ``internalCreateDataFrame`` re-root reported
``sizeInBytes=Long.Max``, making every staged cut broadcast-INeligible
downstream (keyed agg+self-join pattern below: 2 exchanges vs local's
1).  The ``LogicalRDD.fromDataset`` re-root (what ``stage()`` now
uses) carries the origin stats and restores exchange parity (1 == 1).

This probe isolates exactly that pattern, reps times per mode:

  base = lineitem.repartition(P, key)   # known hash partitioning
  cut  = stage(base, eager=True)        # mode under test
  agg  = cut.groupBy(key).sum(...)      # keyed agg on the cut
  out  = cut.join(agg, key)             # keyed self-join on the cut

and reports, for each mode, the executed-plan exchange count (counted
AFTER an action so AQE's final plan is what's inspected) and the action
wall time, plus a lineage-length control (number of plan nodes) to
confirm both modes really did re-root.

Usage: python tools/persist_partitioning_probe.py [sf_dir] [reps]
No exit-code gate: this is a measurement, not an invariant — the result
paragraph lives in SCALING.md.
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from backend_spark.scale import STAGE_MODE_CONF, stage  # noqa: E402
from backend_spark.session import get_session, load_table  # noqa: E402


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(plan: str) -> int:
    # count shuffle exchanges only; AQEShuffleRead / reused exchanges
    # re-read an existing shuffle rather than adding one
    return len(re.findall(r"\bExchange hashpartitioning", plan))


def probe(spark, sf_dir: str, mode: str, reps: int) -> dict:
    spark.conf.set(STAGE_MODE_CONF, mode)
    lineitem = load_table(spark, sf_dir, "lineitem")
    walls = []
    n_ex = n_nodes = rows = None
    for _ in range(reps):
        base = lineitem.repartition(32, "l_orderkey")
        cut = stage(base, eager=True)
        agg = cut.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        out = cut.join(agg, "l_orderkey").where(F.col("q") > 0)
        t0 = time.time()
        rows = out.count()
        walls.append(time.time() - t0)
        plan = _executed(out)
        n_ex = _exchanges(plan)
        n_nodes = plan.count("\n")
        handle = getattr(cut, "_sg_persist_handle", None)
        if handle is not None:
            handle.unpersist(blocking=True)
    walls.sort()
    return {
        "mode": mode,
        "rows": rows,
        "exchanges": n_ex,
        "plan_lines": n_nodes,
        "wall_median": round(walls[len(walls) // 2], 3),
        "walls": [round(w, 3) for w in walls],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("persist_partitioning_probe", cpus=8)
    for mode in ("local", "persist"):
        r = probe(spark, sf_dir, mode, reps)
        print(
            f"{r['mode']:8s} rows={r['rows']} exchanges={r['exchanges']} "
            f"plan_lines={r['plan_lines']} wall_median={r['wall_median']} "
            f"walls={r['walls']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
