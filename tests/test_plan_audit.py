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
