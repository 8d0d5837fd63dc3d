"""Structured Streaming extensions (SURVEY.md §2.9 / §7 step 10).

The reference is purely batch — its only "streaming" is incremental
append writes (code/recipes.py:722-724).  These helpers give recipes a
streaming input path with the canonical Spark constructs: file-source
readStream, watermarked tumbling/sliding window aggregates, and
stateful sessionization.  The same recipe step functions (pure
DataFrame -> DataFrame Column transformations) apply unchanged to a
streaming frame — that is the point of building on the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (each new file is a micro-batch).  Schema is
    required by Spark for file streams — pass one or point at a
    directory with existing files to infer from."""
    reader = spark.readStream.format(fmt)
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_by: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregate — the streaming
    equivalent of ``groupby agg`` (late rows beyond ``watermark`` are
    dropped; state is bounded, which is what makes this run forever at
    100 TB/day ingest)."""
    aggs = aggs or {"*": "count"}
    agg_map = {"count": F.count, "sum": F.sum, "mean": F.avg, "max": F.max, "min": F.min}
    exprs = []
    for col, fname in aggs.items():
        target = F.lit(1) if col == "*" else F.col(col)
        exprs.append(agg_map[fname](target).alias(f"{col if col != '*' else 'rows'}_{fname}"))
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("window"), *(group_by or []))
        .agg(*exprs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_by or []),
            *[c for c in [f"{col if col != '*' else 'rows'}_{f}" for col, f in aggs.items()]],
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key — `F.session_window` keeps
    state per open session only, the scalable construct for user
    sessionization."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("session"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming deduplication: keep the first event per key within the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state per
    live key only, evicted as the watermark passes, so memory is
    bounded no matter how long the stream runs).  The streaming
    counterpart of ``llm.dedup_exact`` for ingest pipelines."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    range_cond: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with watermarks on both sides plus a
    required event-time range bound (Spark needs both to know when
    buffered state can be evicted).  ``range_cond`` defaults to
    "right within [left, left + 1 hour]"."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for c in on:
        eq = lw[c] == rw[c]
        cond = eq if cond is None else cond & eq
    rng = (
        F.expr(range_cond)
        if range_cond
        else (rw[right_ts] >= lw[left_ts]) & (rw[right_ts] <= lw[left_ts] + F.expr("INTERVAL 1 HOUR"))
    )
    joined = lw.join(rw, cond & rng, how)
    # drop the duplicated equi-key columns from the right side
    return joined.drop(*[rw[c] for c in on])


def stateful_running_count(
    df: DataFrame,
    key_col: str,
    key_type: str = "string",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    extension point SURVEY.md §2.9 names for operators Spark's windowed
    aggs can't express): a per-key running total that survives across
    micro-batches through the state store.  Emits one row per key per
    batch with the batch's count and the all-time total.

    The same pattern (state = arbitrary tuple, arrow-batched updates)
    carries any reference-style accumulator — dedup-seen sets, session
    carts, rate counters — with state bounded per active key, which is
    what keeps it running at 100 TB/day.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _count(key, pdfs, state):
        import pandas as pd

        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame(
            {key_col: [key[0]], "batch_events": [n], "total_events": [total]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        _count,
        outputStructType=f"{key_col} {key_type}, batch_events long, total_events long",
        stateStructType="total long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append", checkpoint: str | None = None):
    """Drain a stream into an in-memory table with availableNow (test
    harness; production sinks are parquet/kafka via writeStream)."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
