import pytest

from backend_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=4)
    yield s
