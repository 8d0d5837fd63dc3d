"""Grouping operators (reference: code/recipes.py:2087-2108, SURVEY.md §2.3).

`agg` reduces, `transform` window-broadcasts the aggregate back to every
row, `rank` dense-ranks within the group.  The reference computes these
per-chunk (accidental locality); Spark's global groupBy/Window is the
intended semantics (SURVEY.md §2.3 note).

Scale note: groupBy is a map-side-combined hash aggregate — one shuffle
on the group keys; transform/rank are window functions over the same
partitioning, so chaining them after an agg on identical keys reuses
the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_AGG = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "count": F.count,
    "max": F.max,
    "min": F.min,
    "first": F.first,
    "last": F.last,
    "std": F.stddev,
    "var": F.variance,
    "nunique": F.countDistinct,
    "list": F.collect_list,
    "set": F.collect_set,
}


def op_groupby(
    df: DataFrame,
    select: list[str],
    agg: dict | None = None,
    transform: dict | None = None,
    rank: list[str] | dict | None = None,
) -> DataFrame:
    """Reference internal_groupby.  Exactly one of agg/transform/rank.

    agg:       {col: fn | [fns]} -> one row per group, columns col_fn
               ('list' -> collect_list, reference tools.union).
               'first'/'last' are partition-order-dependent in Spark,
               exactly as they are row-order-dependent in the
               reference's pandas — pick min/max or compact_latest
               when the choice must be reproducible.
    transform: {col: fn} -> per-group aggregate appended to every row
               as col_fn (window aggregate, no frame).
    rank:      [col] -> dense_rank desc within group as col_rank.
    """
    if agg:
        exprs = []
        for col, fns in agg.items():
            for f in fns if isinstance(fns, (list, tuple)) else [fns]:
                if f not in _AGG:
                    raise ValueError(f"unknown aggregation: {f}")
                exprs.append(_AGG[f](col).alias(f"{col}_{f}" if f != "first" else col))
        return df.groupBy(*select).agg(*exprs)
    if transform:
        out = df
        w = Window.partitionBy(*select)
        for col, f in transform.items():
            if f not in _AGG:
                raise ValueError(f"unknown aggregation: {f}")
            out = out.withColumn(f"{col}_{f}", _AGG[f](col).over(w))
        return out
    if rank:
        cols = list(rank) if not isinstance(rank, dict) else list(rank.keys())
        out = df
        for col in cols:
            w = Window.partitionBy(*select).orderBy(F.col(col).desc())
            out = out.withColumn(f"{col}_rank", F.dense_rank().over(w))
        return out
    raise ValueError("groupby requires one of agg/transform/rank")


def compact_latest(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """CDC log compaction: keep only the newest row per key — the merge
    step an incrementally-updated corpus or feature store runs on every
    ingest (upsert semantics over an append-only event log).

    One ``max_by(struct(all columns), (ts, tiebreak))`` aggregate with
    partial (map-side) combine: each task keeps one candidate row per
    key, so the shuffle carries ~|keys| rows, not |log| rows — strictly
    cheaper than the window/row_number formulation, which must shuffle
    and sort the entire log.  Struct aggregation buffers lower to
    SortAggregate rather than HashAggregate, but those sorts are
    partition-local (pinned in tools/explain_audit.py: partial_max_by
    present, no Window).  Ties on ``ts_col`` break by ``tiebreak_col``
    (highest wins) for run-to-run determinism.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in df.columns if c not in keys]
    order = F.struct(
        F.col(ts_col), *( [F.col(tiebreak_col)] if tiebreak_col else [] )
    )
    row = F.max_by(F.struct(*[F.col(c) for c in payload]), order).alias("__row")
    out = df.groupBy(*keys).agg(row)
    return out.select(*keys, *[F.col("__row")[c].alias(c) for c in payload])


def rollup_agg(
    df: DataFrame,
    keys: list[str],
    agg: dict[str, str | list[str]],
    cube: bool = False,
) -> DataFrame:
    """Hierarchical subtotals (ROLLUP) or all-combination subtotals
    (CUBE) with a ``gid`` grouping-id column disambiguating subtotal
    rows from genuine-null keys.

    One shuffle: Spark expands each input row into its grouping sets
    map-side (Expand), then a single map-side-combined hash aggregate —
    the same cost shape as a plain groupBy, multiplied by the number of
    grouping sets (|keys|+1 for rollup, 2^|keys| for cube; keep key
    lists short at 100 TB, which analysts' rollups are).
    """
    g = df.cube(*keys) if cube else df.rollup(*keys)
    exprs = []
    for col, fns in agg.items():
        for f in fns if isinstance(fns, (list, tuple)) else [fns]:
            if f not in _AGG:
                raise ValueError(f"unknown aggregation: {f}")
            exprs.append(_AGG[f](col).alias(f"{col}_{f}"))
    return g.agg(*exprs, F.grouping_id().alias("gid"))
