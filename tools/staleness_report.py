"""Driver-evidence staleness report (VERDICT r8, Next-round #7).

For every query in the live registry, find the latest round whose
driver CORRECTNESS_r*.json contains a row for it and whether that row
was green (rows+schema+hash all true; hash-less rows-only greens are
flagged).  Queries the driver has NEVER checked sort first, then
oldest evidence first — that ordering IS the next round's rotation
plan, so prefix planning stays mechanical instead of archaeology.

Usage: python tools/staleness_report.py [--limit N]
Reads the repo-root CORRECTNESS_r*.json history; no Spark needed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def load_history() -> dict[str, tuple[int, str]]:
    """query -> (latest round with a driver row, status in that round)."""
    latest: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            try:
                data = json.load(f)
            except json.JSONDecodeError:
                continue
        for name, row in data.items():
            if row.get("err") == "no_oracle":
                # the driver's expected weaker rows-only check for
                # queries that (by design) register no oracle SQL
                status = "no-oracle-ok" if row.get("spark_rows") is not None else "ERROR"
            elif row.get("err"):
                status = "ERROR"
            elif row.get("hash_match"):
                status = "green"
            elif row.get("rows_match") and row.get("schema_match"):
                status = "rows-only"
            else:
                status = "RED"
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, status)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0, help="print only the N stalest")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    registry = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    history = load_history()

    rows = []
    for name in registry:
        rnd, status = history.get(name, (0, "never-checked"))
        rows.append((rnd, name, status, "exact" if name in oracles else "rows-only-by-design"))
    rows.sort(key=lambda r: (r[0], r[1]))

    rounds = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    print(f"# staleness report — {len(registry)} registry queries, "
          f"{len(rounds)} driver rounds on record")
    shown = rows[: args.limit] if args.limit else rows
    for rnd, name, status, kind in shown:
        label = f"r{rnd}" if rnd else "NEVER"
        print(f"{label:>6}  {status:<13}  {kind:<20}  {name}")
    by_round: dict[str, int] = {}
    bad = [r for r in rows if r[2] in ("RED", "ERROR")]
    for rnd, *_ in rows:
        key = f"r{rnd}" if rnd else "never"
        by_round[key] = by_round.get(key, 0) + 1
    print("\n# summary:", ", ".join(f"{k}={v}" for k, v in sorted(by_round.items())))
    if bad:
        print(f"# ATTENTION: {len(bad)} red/errored latest rows:",
              ", ".join(r[1] for r in bad))


if __name__ == "__main__":
    main()
