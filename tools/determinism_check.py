"""Parallelism-determinism gate: run every ``queries()`` entry under
three deliberately different execution shapes (shuffle partitions 32
vs 3, file splits default vs tiny, Arrow batch default vs 64 records)
and diff the canonical results.

This targets the bug class behind the one red driver row of round 4
(char_entropy): a float aggregate whose partial-sum order changes with
partitioning can round differently at a value boundary, so it passes at
one parallelism and fails at another.  The third shape shrinks
``spark.sql.execution.arrow.maxRecordsPerBatch`` so every
mapInPandas/applyInPandas/pandas_udf boundary sees many small Arrow
batches — a UDF that accidentally depends on batch extent (state
carried across rows, per-batch reductions folded in float order)
diverges here while passing both row-shape runs.  Any query listed by
this tool is nondeterministic under Spark's execution model and will
eventually diverge from its oracle on some machine.

Usage: python tools/determinism_check.py [name ...]   (exit 1 on diff)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from backend_spark.session import get_session  # noqa: E402
from tools.check_oracle import SF_DIR, _canon  # noqa: E402

SHAPES = (
    {"spark.sql.shuffle.partitions": "32",
     "spark.sql.files.maxPartitionBytes": "134217728",
     "spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
    {"spark.sql.shuffle.partitions": "3",
     "spark.sql.files.maxPartitionBytes": "65536",
     "spark.sql.execution.arrow.maxRecordsPerBatch": "10000"},
    {"spark.sql.shuffle.partitions": "32",
     "spark.sql.files.maxPartitionBytes": "134217728",
     "spark.sql.execution.arrow.maxRecordsPerBatch": "64"},
)


def main(only=None) -> int:
    spark = get_session("determinism-check")
    qs = entry_mod.queries()
    bad, errs = [], []
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        runs = []
        try:
            for shape in SHAPES:
                for k, v in shape.items():
                    spark.conf.set(k, v)
                runs.append(_canon(q(spark, SF_DIR).toPandas())[0])
        except Exception as e:
            errs.append(name)
            print(f"!  {name:20s} ERROR {type(e).__name__}: {str(e)[:160]}")
            continue
        finally:
            for k, v in SHAPES[0].items():
                spark.conf.set(k, v)
        if any(r != runs[0] for r in runs[1:]):
            bad.append(name)
            other = next(i for i, r in enumerate(runs) if r != runs[0])
            diff = next(
                ((i, a, b) for i, (a, b) in enumerate(zip(runs[0], runs[other])) if a != b),
                None,
            )
            if diff is None:  # one result is a prefix of the other
                print(f"✗ {name:20s} DIVERGES in row count: "
                      f"shape A {len(runs[0])} rows, shape {other} {len(runs[other])} rows")
            else:
                print(f"✗ {name:20s} DIVERGES (shape {other}) at sorted row {diff[0]}:\n"
                      f"    shape A: {diff[1]}\n    shape {other}: {diff[2]}")
        else:
            print(f"✓ {name:20s} stable ({len(runs[0])} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(bad)} divergent, {len(errs)} errored")
    if bad:
        print("divergent:", " ".join(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
