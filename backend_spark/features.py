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
