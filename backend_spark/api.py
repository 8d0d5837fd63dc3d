"""REST API layer mirroring the reference's Flask surface
(code/api.py:91-92, endpoints :581-1074; SURVEY.md §3) on the stdlib
ThreadingHTTPServer — no web-framework dependency.

Endpoints (JSON in/out):

* ``PUT  /recipes/<name>/run``   — start the recipe as a background job
  (the reference forks a multiprocessing job, code/api.py:1000-1023;
  here a thread drives one Spark action — Spark parallelizes inside).
* ``PUT  /recipes/<name>/test``  — run on a 30-row sample, return rows
  (reference test entry point, code/api.py:975-999).
* ``POST /recipes/<name>/apply`` — apply the recipe to uploaded
  CSV/JSONL rows in the request body, return transformed rows
  (reference live apply, code/api.py:940-963).
* ``GET  /jobs``                 — job registry with status up/done/down
  (reference code/api.py:862-879, :1040-1074).
* ``POST /datasets/<name>``      — sample rows + dtypes of a dataset
  (reference code/api.py:581-623).
* ``GET  /health``               — liveness.
"""

from __future__ import annotations

import io
import json
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from backend_spark.plans import RecipeBook


class JobRegistry:
    """In-memory job table (reference: config.jobs + log-file polling)."""

    def __init__(self):
        self._jobs: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._n = 0

    def start(self, recipe: str, fn) -> str:
        with self._lock:
            self._n += 1
            job_id = f"{recipe}-{self._n}"
            self._jobs[job_id] = {"recipe": recipe, "status": "up", "rows": None, "error": None}

        def _run():
            try:
                rows = fn()
                with self._lock:
                    self._jobs[job_id].update(status="done", rows=rows)
            except Exception as e:  # job failure -> status down (reference semantics)
                with self._lock:
                    self._jobs[job_id].update(status="down", error=f"{type(e).__name__}: {e}")

        threading.Thread(target=_run, name=job_id, daemon=True).start()
        return job_id

    def snapshot(self) -> dict:
        with self._lock:
            return {k: dict(v) for k, v in self._jobs.items()}


class ApiServer:
    def __init__(self, spark: SparkSession, book: RecipeBook, host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.book = book
        self.jobs = JobRegistry()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload):
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n) if n else b""

            def do_GET(self):
                if self.path == "/health":
                    return self._send(200, {"status": "up"})
                if self.path == "/jobs":
                    return self._send(200, outer.jobs.snapshot())
                return self._send(404, {"error": "not found"})

            def do_PUT(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 3 and parts[0] == "recipes":
                    name, action = parts[1], parts[2]
                    if name not in outer.book.recipes:
                        return self._send(404, {"error": f"unknown recipe {name}"})
                    try:
                        if action == "test":
                            df = outer.book.run(name, test=True)
                            rows = [r.asDict(recursive=True) for r in df.limit(30).collect()]
                            steps = outer.book.trace(name)
                            return self._send(
                                200,
                                {"rows": rows, "schema": df.schema.simpleString(), "steps": steps},
                            )
                        if action == "run":
                            job_id = outer.jobs.start(
                                name, lambda: outer.book.run(name).count()
                            )
                            return self._send(202, {"job": job_id, "status": "up"})
                    except Exception as e:
                        return self._send(500, {"error": str(e), "trace": traceback.format_exc()[-2000:]})
                return self._send(404, {"error": "not found"})

            def do_POST(self):
                parts = self.path.strip("/").split("/")
                try:
                    if len(parts) == 3 and parts[0] == "recipes" and parts[2] == "apply":
                        name = parts[1]
                        if name not in outer.book.recipes:
                            return self._send(404, {"error": f"unknown recipe {name}"})
                        ctype = self.headers.get("Content-Type", "application/json")
                        raw = self._body().decode()
                        import pandas as pd

                        if "csv" in ctype:
                            pdf = pd.read_csv(io.StringIO(raw), dtype=str, keep_default_na=False)
                        else:
                            pdf = pd.DataFrame(json.loads(raw))
                        df = outer.spark.createDataFrame(pdf)
                        out = outer.book.compile(name)(df)
                        rows = [r.asDict(recursive=True) for r in out.collect()]
                        return self._send(200, {"rows": rows})
                    if len(parts) == 2 and parts[0] == "datasets":
                        df = outer.book.dataset(parts[1])
                        opts = json.loads(self._body() or b"{}")
                        n = int(opts.get("size", 10))
                        rows = [r.asDict(recursive=True) for r in df.limit(n).collect()]
                        return self._send(200, {"rows": rows, "schema": dict(df.dtypes)})
                except KeyError as e:
                    return self._send(404, {"error": str(e)})
                except Exception as e:
                    return self._send(500, {"error": str(e), "trace": traceback.format_exc()[-2000:]})
                return self._send(404, {"error": "not found"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
