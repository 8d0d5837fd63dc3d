"""Per-query bench drift ledger (VERDICT r11, Next-round #4).

Reads every driver ``BENCH_r*.json`` on record (each holds bench.py's
one-line JSON in its ``tail``) plus optional local bench JSON files
passed as arguments, then for each suite/suite2 query prints the
median-of-medians band (min..max across rounds) and mechanically flags
the LATEST reading when it breaks 1.5x the band median — replacing the
hand-adjudication of round-over-round movers.

Usage: python tools/bench_bands.py [extra_bench.json ...] [--md]
Exit 1 if any query breaks its band; --md emits a markdown table for
BENCH_NOTES.md.  No Spark needed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BREAK_FACTOR = 1.5
# flag only when the absolute delta could matter: sub-0.1s readings
# swing multiples with scheduler jitter (BENCH_NOTES rounds 6-7)
MIN_ABS_S = 0.1


def _parse_bench_line(text: str) -> dict | None:
    i = text.rfind('{"metric"')
    if i < 0:
        return None
    try:
        return json.loads(text[i:].strip().split("\n")[0])
    except json.JSONDecodeError:
        return None


def load_rounds(extra: list[str]) -> dict[str, dict]:
    """label -> parsed bench line, in round order then extras."""
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            d = json.load(f)
        b = _parse_bench_line(d.get("tail", "")) or d.get("parsed")
        if b and b.get("suite2"):
            out[f"r{int(m.group(1))}"] = b
    for path in extra:
        with open(path) as f:
            b = _parse_bench_line(f.read())
        if b:
            out[os.path.basename(path)] = b
    return out


def main(argv: list[str]) -> int:
    md = "--md" in argv
    extra = [a for a in argv if a != "--md"]
    rounds = load_rounds(extra)
    if len(rounds) < 2:
        print(f"need >=2 rounds with suite2 data, have {len(rounds)}")
        return 0
    labels = list(rounds)
    latest = labels[-1]
    breaks = []
    rows = []
    for suite_key in ("queries", "suite2"):
        names = sorted(
            {n for b in rounds.values() for n in (b.get(suite_key) or {})}
        )
        for name in names:
            vals = {
                lab: b[suite_key][name]
                for lab, b in rounds.items()
                if name in (b.get(suite_key) or {})
            }
            if len(vals) < 2 or name not in (rounds[latest].get(suite_key) or {}):
                continue
            series = list(vals.values())
            band_med = statistics.median(series)
            lo, hi = min(series), max(series)
            cur = vals[latest]
            broke = (
                cur > band_med * BREAK_FACTOR
                and cur - band_med > MIN_ABS_S
            )
            if broke:
                breaks.append((name, cur, band_med))
            rows.append((suite_key, name, lo, band_med, hi, cur, broke))

    if md:
        print("| suite | query | band min | band median | band max | "
              f"latest ({latest}) | >1.5x? |")
        print("|---|---|---|---|---|---|---|")
        for sk, name, lo, med, hi, cur, broke in rows:
            flag = "**BREAK**" if broke else ""
            print(f"| {sk} | `{name}` | {lo:.3f} | {med:.3f} | {hi:.3f} | "
                  f"{cur:.3f} | {flag} |")
    else:
        print(f"# rounds: {', '.join(labels)}  (latest = {latest})")
        for sk, name, lo, med, hi, cur, broke in rows:
            mark = "BREAK" if broke else "ok   "
            print(f"{mark} {sk:7s} {name:20s} band {lo:6.3f}..{hi:6.3f} "
                  f"med {med:6.3f}  latest {cur:6.3f}")
    print(f"\n{len(breaks)} band break(s)"
          + (": " + ", ".join(n for n, *_ in breaks) if breaks else ""))
    return 1 if breaks else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
