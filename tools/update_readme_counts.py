"""Regenerate the contract counts in README.md from the source of truth
(queries()/oracle_sql() registration and pytest collection), so the
numbers cannot drift from the code.

Usage: python tools/update_readme_counts.py  (rewrites README.md in place)
"""

from __future__ import annotations

import re
import subprocess
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    n_queries = len(entry_mod.queries())
    n_oracles = len(entry_mod.oracle_sql())
    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(r"(\d+) tests collected", collected)
    if not m:
        raise SystemExit(f"could not parse pytest collection output:\n{collected[-500:]}")
    n_tests = int(m.group(1))

    readme = open("README.md").read()
    readme, c1 = re.subn(r"`queries\(\)` \(\d+ operators\)",
                         f"`queries()` ({n_queries} operators)", readme)
    readme, c2 = re.subn(r"`oracle_sql\(\)` \(\d+ exact DuckDB oracles",
                         f"`oracle_sql()` ({n_oracles} exact DuckDB oracles", readme)
    readme, c3 = re.subn(r"\d+ pytest cases", f"{n_tests} pytest cases", readme)
    if not (c1 == c2 == c3 == 1):
        raise SystemExit(f"README anchors not found exactly once: {c1}/{c2}/{c3}")
    open("README.md", "w").write(readme)
    print(f"README.md: queries={n_queries} oracles={n_oracles} tests={n_tests}")


if __name__ == "__main__":
    main()
