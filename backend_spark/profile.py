"""Dataset profiling: per-column statistics in ONE pass over the data.

The reference exposes dataset metadata/preview through its API layer
(reference: code/api.py dataset endpoints, SURVEY.md §2.7); this is the
engine-side profiler a 100 TB pipeline wants before committing to a
recipe — null rates, cardinalities, ranges — computed as a single
aggregate, never one scan per column.

Scale shape: all per-column statistics fold into one ``df.agg(...)``
(map-side combined, one shuffle of a single state row).  Exact distinct
counts force Catalyst's Expand (data duplicated once per distinct
column) — linear but K-fold, so the default is
``approx_count_distinct`` (HLL++, one pass, no Expand); pass
``exact=True`` when the profile must be reproducible bit-for-bit (the
driver oracle does).  The wide one-row result pivots to long form with
``stack`` — driver-side cost is K rows, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> DataFrame:
    """Per-column stats: ``(col_name, n, n_null, n_distinct, min_num,
    max_num, min_len, max_len)`` — numeric columns fill ``min_num`` /
    ``max_num`` (as double), string columns fill ``min_len`` /
    ``max_len``; every metric numeric so the schema is uniform and
    cross-engine comparable (no engine-specific value-to-string
    formatting in the output).
    """
    cols = columns or df.columns
    # Deliberately NOT spread_scan'd (round-15, measured): spreading a
    # 1-row-group input before the stats aggregate TRIPLED the query
    # (0.35 s -> 0.98 s median at sf0.1) — the exact-distinct partial
    # state is near-fully deduplicated when one task folds the whole
    # scan, and spreading multiplies the per-partition distinct sets
    # the exchange must carry (guide §2.3: aggregate before you
    # shuffle).
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(F.lit(1)).alias(f"{c}__n"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nnull"))
        aggs.append(distinct(c).alias(f"{c}__nd"))
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
        if isinstance(dt, StringType):
            aggs.append(F.min(F.length(c)).cast("long").alias(f"{c}__minl"))
            aggs.append(F.max(F.length(c)).cast("long").alias(f"{c}__maxl"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"{c}__minl"))
            aggs.append(F.lit(None).cast("long").alias(f"{c}__maxl"))
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__n, {c}__nnull, {c}__nd, {c}__min, {c}__max, {c}__minl, {c}__maxl"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n, n_null, n_distinct, min_num, max_num, min_len, max_len)"
        )
    )
