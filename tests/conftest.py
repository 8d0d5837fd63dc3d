import os

import pytest

from backend_spark.session import get_session

# frozen slow-tier membership (see pytest.ini and tests/slow_tests.txt)
_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
with open(_SLOW_FILE) as _f:
    _SLOW = {ln.strip() for ln in _f if ln.strip() and not ln.startswith("#")}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = os.path.basename(item.fspath.strpath) + "::" + item.nodeid.split("::", 1)[1]
        if key in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=4)
    yield s
