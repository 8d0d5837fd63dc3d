"""Physical-plan audit as part of the suite: every audited driver query
must keep the plan properties the 100 TB design depends on (pushdown
reaching the scan, broadcast referential joins, no cartesian products).
Shares EXPECT with tools/explain_audit.py so the CLI and CI can't drift.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import EXPECT, SF_DIR, audit_query  # noqa: E402


@pytest.fixture(scope="module")
def _queries():
    import __spark_entry__ as entry_mod

    return entry_mod.queries()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata not present")
@pytest.mark.parametrize("name", sorted(EXPECT))
def test_plan_properties(spark, _queries, name):
    failures = audit_query(spark, _queries, name)
    assert not failures, failures


def test_float_heavy_queries_parallelism_deterministic(spark):
    """Regression guard for the round-4 char_entropy class: queries whose
    aggregates involve float sums must return identical results under
    different shuffle/split shapes.  The full sweep lives in
    tools/determinism_check.py (98/98 stable); this pins the riskiest."""
    import __spark_entry__ as entry_mod
    from tools.check_oracle import SF_DIR, _canon
    from tools.determinism_check import SHAPES

    qs = entry_mod.queries()
    try:
        for name in ("char_entropy", "eigenvector", "collocations", "zscore"):
            runs = []
            for shape in SHAPES:
                for k, v in shape.items():
                    spark.conf.set(k, v)
                runs.append(_canon(qs[name](spark, SF_DIR).toPandas())[0])
            assert runs[0] == runs[1], f"{name} diverges across execution shapes"
    finally:
        for k in SHAPES[1]:
            spark.conf.unset(k)
