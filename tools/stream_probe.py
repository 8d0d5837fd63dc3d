"""Streaming throughput probe (round-15): measured rows/sec and
state-store footprint for the stateful streaming operators, turning
SCALING.md's "state is bounded, nothing grows with stream length"
design claim into numbers.

Drives each operator from a `rate-micro-batch` source (deterministic:
`rowsPerBatch` rows per trigger, monotonically increasing timestamps,
synthetic keys with realistic cardinality), runs a fixed number of
micro-batches through a noop-equivalent memory-free sink (foreachBatch
count), and reports from StreamingQueryProgress:

* processed rows/sec (median across steady-state batches),
* state rows + state bytes at the final batch (the bounded-state
  check: with watermark eviction these plateau instead of growing
  with batch count).

Usage: python tools/stream_probe.py [--batches 30] [--rows 100000]
No exit gate — numbers land in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from backend_spark import streaming  # noqa: E402
from backend_spark.session import get_session  # noqa: E402


def _source(spark, rows_per_batch: int):
    """Deterministic micro-batch source: `value` is a global row index;
    derive event time (1000 rows/sec of event time) and a 5k-key space
    so session/window state has realistic cardinality."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("startTimestamp", 0)
        # 5s of EVENT time per batch: after ~7 batches the 30s watermark
        # starts passing window/session/dedup horizons, so the probe
        # exercises state EVICTION, not just slow growth — the plateau in
        # the state-rows curve is the bounded-state mechanism firing
        .option("advanceMillisPerBatch", 5000)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5000).alias("user_id"),
            (F.col("value") % 7).cast("string").alias("event_type"),
            (F.col("value") % 1000).cast("double").alias("value"),
        )
    )


def _run(name, stream_df, batches: int, output_mode: str = "update"):
    def sink(df, _eid):
        df.count()  # materialize the batch; output itself is not the metric

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .trigger(processingTime="0 seconds")
        .start()
    )
    # one rate sample per BATCH (recentProgress, deduped by batchId) —
    # polling lastProgress alone would double-count slow batches and
    # miss fast ones, poll-weighting the median
    rates_by_batch: dict[int, float] = {}
    state_curve: dict[int, int] = {}
    state_rows = state_bytes = 0
    try:
        t0 = time.time()
        while len(rates_by_batch) < batches and time.time() - t0 < 300:
            time.sleep(0.5)
            for p in q.recentProgress:
                if p["batchId"] < 1 or not p["numInputRows"]:
                    continue
                rates_by_batch[p["batchId"]] = p["processedRowsPerSecond"]
                for op in p.get("stateOperators", []):
                    state_curve[p["batchId"]] = op.get("numRowsTotal", 0)
                    state_rows = op.get("numRowsTotal", 0)
                    state_bytes = op.get("memoryUsedBytes", 0)
    finally:
        q.stop()
    rates = list(rates_by_batch.values())
    med = statistics.median(rates) if rates else float("nan")
    print(
        f"{name:18s} median {med:>12,.0f} rows/s   "
        f"state {state_rows:>9,} rows / {state_bytes / 1e6:7.1f} MB   "
        f"({len(rates)} steady batches)"
    )
    curve = [state_curve[b] for b in sorted(state_curve)]
    print(f"{'':18s} state-rows curve: {curve}")
    return {"rows_per_sec": round(med), "state_rows": state_rows,
            "state_bytes": state_bytes, "state_curve": curve}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()

    spark = get_session("stream_probe")
    src = _source(spark, args.rows)
    results = {}
    results["windowed_agg"] = _run(
        "windowed_agg",
        streaming.windowed_agg(
            src, "ts", window="10 seconds", watermark="30 seconds",
            group_by=["event_type"], aggs={"value": "sum", "*": "count"},
        ),
        args.batches,
    )
    results["sessionize"] = _run(
        "sessionize",
        streaming.sessionize(src, "ts", "user_id", gap="5 seconds",
                             watermark="30 seconds"),
        args.batches,
        output_mode="append",  # session windows reject update mode
    )
    results["dedup_stream"] = _run(
        "dedup_stream",
        streaming.dedup_stream(src, ["user_id", "event_type"], "ts",
                               watermark="30 seconds"),
        args.batches,
        output_mode="append",
    )
    spark.stop()
    print(json.dumps({"rows_per_batch": args.rows, "batches": args.batches,
                      "results": results}))


if __name__ == "__main__":
    main()
