"""Registry-wide physical-plan smell sweep — the coarse complement to
``explain_audit.py``'s per-query pins: walk EVERY ``queries()`` entry
and count SortMergeJoin / BroadcastNestedLoopJoin / CartesianProduct /
Exchange / Window occurrences in its executed plan.

The audit pins what each query MUST (not) contain; this sweep catches
the queries nobody pinned yet — a new operator that silently plans a
cartesian or an unexpected sort-merge shows up here before it ships.
CartesianProduct anywhere is a hard failure (exit 1); everything else
prints for review (SMJ/NLJ have documented-legitimate uses:
comparable-size graph joins, broadcast-scalar attachment).

Usage: python tools/plan_sweep.py            (exit 1 on any cartesian)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from backend_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    spark = get_session("plan-sweep", cpus=8)
    cartesians = []
    rows = []
    for name, fn in entry_mod.queries().items():
        if name.startswith("stream_"):  # streaming queries execute on build
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"ERR  {name}: {str(e)[:120]}")
            continue
        counts = (
            plan.count("SortMergeJoin"),
            plan.count("BroadcastNestedLoopJoin"),
            plan.count("CartesianProduct"),
            plan.count("Exchange"),
            plan.count("Window"),
        )
        rows.append((name, *counts))
        if counts[2]:
            cartesians.append(name)
    print(f"{'query':24} SMJ NLJ CART EXCH WIN")
    for name, smj, nlj, cart, exch, win in sorted(rows, key=lambda r: (-r[3], -r[1])):
        if smj or nlj or cart or exch > 6:
            print(f"{name:24} {smj:3} {nlj:3} {cart:4} {exch:4} {win:3}")
    print(f"\nswept {len(rows)} query plans; cartesians: {cartesians or 'none'}")
    return 1 if cartesians else 0


if __name__ == "__main__":
    sys.exit(main())
