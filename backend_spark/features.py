"""Feature-engineering operators: discretization and standardization.

Training pipelines bin and standardize features before model fitting
(reference trains on precomputed score columns, code/recipes.py
build_model; these produce such columns at corpus scale).

Both operators follow the same 100 TB shape as ``llm.percentile_filter``:
the per-group statistics reduce to |groups| (or |groups| x |bins|) rows
in one map-side-combined aggregate, broadcast back onto the scan — the
corpus itself never shuffles and never sorts.  The naive formulations
(global ``ntile`` = every row through ONE partition; window
mean/stddev = full shuffle) are exactly what these avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    group_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency discretization: assign each row the bin index in
    ``[0, n_bins)`` of its ``col`` value within its group's exact
    quantile grid (bin = number of interior quantile boundaries <= x).

    Boundaries are exact ``F.percentile`` (reproducible; interpolated
    midpoints are exact in doubles for integer inputs), collected into
    one tiny array per group and broadcast — binning is then a pure
    Column fold over the boundary array, no shuffle of the data.
    """
    out = out_col or f"{col}_bin"
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs])).alias("__bounds")
    if group_col is not None:
        thr = df.groupBy(group_col).agg(bounds)
        joined = df.join(F.broadcast(thr), group_col, "inner")
    else:
        joined = df.join(F.broadcast(df.agg(bounds)))
    binned = joined.withColumn(
        out,
        F.aggregate(
            "__bounds",
            F.lit(0),
            lambda acc, b: acc + F.when(F.col(col) >= b, 1).otherwise(0),
        ),
    )
    return binned.drop("__bounds")


def zscore(
    df: DataFrame,
    col: str,
    group_col: str | None = None,
    out_col: str | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """Per-group standardization ``(x - mean) / stddev`` (sample
    stddev), rounded to ``ndigits`` so the result is reproducible
    cross-engine despite summation-order float drift.  Groups with zero
    variance (or a single row) get null, never a division error.
    """
    out = out_col or f"{col}_z"
    aggs = [
        F.avg(col).alias("__mean"),
        F.stddev_samp(col).alias("__std"),
    ]
    if group_col is not None:
        stats = df.groupBy(group_col).agg(*aggs)
        joined = df.join(F.broadcast(stats), group_col, "inner")
    else:
        joined = df.join(F.broadcast(df.agg(*aggs)))
    scored = joined.withColumn(
        out,
        F.when(
            F.col("__std") > 0,
            F.round((F.col(col) - F.col("__mean")) / F.col("__std"), ndigits),
        ),
    )
    return scored.drop("__mean", "__std")


def resample_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    bucket: int,
    value_col: str | None = None,
) -> DataFrame:
    """Time-series resampling with gap fill: aggregate into fixed
    ``bucket``-width bins (same units as ``ts_col``) and emit EVERY
    bucket between each key's first and last event — empty buckets
    appear with ``n_events = 0`` (and null sum), which downstream
    models need and a plain groupBy silently omits.

    Shuffle budget: one keyed aggregate for the bin stats and one for
    the per-key span (same key — AQE reuses the exchange); the dense
    grid explodes from |keys| span rows (bounded by time-span /
    bucket, not by event count) and hash-joins back.  Nothing scans
    the raw events twice.
    """
    b = df.withColumn(
        "__bucket", (F.expr(f"{ts_col} div {bucket}") * F.lit(bucket)).cast("long")
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias(f"{value_col}_sum"))
    stats = b.groupBy(key_col, "__bucket").agg(*aggs)
    span = b.groupBy(key_col).agg(
        F.min("__bucket").alias("__mn"), F.max("__bucket").alias("__mx")
    )
    grid = span.select(
        key_col,
        F.explode(F.sequence("__mn", "__mx", F.lit(bucket))).alias("__bucket"),
    )
    out = grid.join(stats, [key_col, "__bucket"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0))
    )
    return out.withColumnRenamed("__bucket", "bucket")


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest time each
    step occurred strictly AFTER the previous step completed (classic
    click → view → purchase conversion measurement).  Output has one
    row per key with ``step_<i>_ts`` columns (null once the funnel
    breaks) and ``reached`` = number of completed steps.

    Each step is one conditional-min aggregate on the SAME key, joined
    back — Spark reuses the key exchange across stages, so cost is
    |steps| map-side-combined aggregates, never a per-key sort or a
    pattern-match over raw rows.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    prev = None
    out = df.select(key_col).distinct()
    for i, step in enumerate(steps):
        col = f"step_{i}_ts"
        if prev is None:
            agg = df.where(F.col(type_col) == step).groupBy(key_col).agg(
                F.min(ts_col).alias(col)
            )
        else:
            agg = (
                df.join(out.select(key_col, prev), key_col)
                .where((F.col(type_col) == step) & (F.col(ts_col) > F.col(prev)))
                .groupBy(key_col)
                .agg(F.min(ts_col).alias(col))
            )
        out = out.join(agg, key_col, "left")
        prev = col
    reached = None
    for i in range(len(steps)):
        c = F.when(F.col(f"step_{i}_ts").isNotNull(), 1).otherwise(0)
        reached = c if reached is None else reached + c
    # a null step nulls all later steps by construction (join condition
    # references the previous step's timestamp)
    return out.withColumn("reached", reached)


def winsorize(
    df: DataFrame,
    col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    group_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorized clipping at exact quantiles: cap ``col`` into its
    [``lower``, ``upper``] percentile band (optionally per group) —
    the tail-robust cleanup for heavy-tailed numerics before scaling
    or model features, keeping every row (the row-*dropping* variant
    is :func:`backend_spark.llm.percentile_filter`).

    Same scale shape as :func:`quantile_bins`: ONE exact
    ``F.percentile`` aggregate produces a two-value boundary array per
    group, broadcast back; the clip itself is pure Column
    ``greatest``/``least`` — the data never shuffles.
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    out = out_col or f"{col}_w"
    bounds = F.percentile(
        F.col(col), F.array(F.lit(lower), F.lit(upper))
    ).alias("__wb")
    if group_col is not None:
        thr = df.groupBy(group_col).agg(bounds)
        joined = df.join(F.broadcast(thr), group_col, "inner")
    else:
        joined = df.join(F.broadcast(df.agg(bounds)))
    return joined.withColumn(
        out,
        F.least(
            F.greatest(F.col(col).cast("double"), F.element_at("__wb", 1)),
            F.element_at("__wb", 2),
        ),
    ).drop("__wb")
