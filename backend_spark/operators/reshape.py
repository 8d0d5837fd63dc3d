"""Reshaping operators for nested data (reference: code/recipes.py:1972-2446,
SURVEY.md §2.6): unfold (explode), unnest (struct/json -> columns),
nest (columns -> json), ngram (blocking keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from backend_spark import functions as fn


def op_unfold(df: DataFrame, select: list[str] | str, fill_na=None) -> DataFrame:
    """Explode array column(s) into rows (reference internal_unfold,
    code/recipes.py:2411-2446).  `fill_na` set -> outer-explode: rows
    with empty/null arrays survive with the fill value (reference test
    tests/test_recipes.py:339-380)."""
    cols = [select] if isinstance(select, str) else list(select)
    out = df
    for c in cols:
        if fill_na is not None:
            # generators can't nest inside expressions: explode in its own
            # projection, then fill (empty/null arrays -> one fill_na row)
            out = out.withColumn(c, F.explode_outer(c))
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(fill_na)))
        else:
            out = out.withColumn(c, F.explode(c))
    return out


def op_unnest(
    df: DataFrame,
    select: str,
    prefix: str = "",
    drop: bool = True,
    schema=None,
    sample_rows: int = 1000,
    max_keys: int = 10000,
) -> DataFrame:
    """Struct / map / JSON-string column -> one column per key, optional
    prefix (reference internal_unnest, code/recipes.py:2378-2394).

    JSON strings are schema-inferred from a bounded sample (first
    ``sample_rows`` non-null cells) — a plan-build step, not a data
    pass; pass ``schema`` to skip sampling entirely.

    Map columns widen to one output column per DISTINCT key, so key
    discovery is bounded by ``max_keys`` — and that bound FAILS FAST
    (round-15; the no-silent-caps rule): a map with more distinct keys
    than ``max_keys`` raises with the observed count instead of
    silently dropping columns.  A >10k-column unnest is a modeling
    error, not a plan — raise ``max_keys`` only deliberately.
    """
    dtype = dict(df.dtypes)[select]
    out = df
    if dtype == "string":
        if schema is None:
            spark = df.sparkSession
            sample = [
                r[0]
                for r in df.select(select).filter(F.col(select).isNotNull()).limit(sample_rows).collect()
            ]
            schema = spark.read.json(spark.sparkContext.parallelize(sample or ["{}"])).schema
        out = out.withColumn(select, F.from_json(F.col(select), schema))
        dtype = "struct"
    if dtype.startswith("map"):
        # fetch cap+1: one extra row proves overflow without counting
        # the full key universe, and the raise names what was observed
        fetched = [
            r[0]
            for r in out.select(F.explode(F.map_keys(select)).alias("k"))
            .distinct()
            .limit(max_keys + 1)
            .collect()
        ]
        if len(fetched) > max_keys:
            raise ValueError(
                f"unnest: map column {select!r} has more than {max_keys} "
                f"distinct keys (observed {len(fetched)}+); unnesting would "
                "silently drop columns. Raise max_keys explicitly or "
                "restructure (explode the map instead of widening it)."
            )
        keys = sorted(fetched)
        for k in keys:
            out = out.withColumn(f"{prefix}{k}", F.col(select).getItem(k))
    else:
        for f in out.schema[select].dataType.fields:
            out = out.withColumn(f"{prefix}{f.name}", F.col(select).getField(f.name))
    return out.drop(select) if drop else out


def op_nest(df: DataFrame, select: list[str], target: str, drop: bool = True) -> DataFrame:
    """Selected columns -> one JSON-string column (reference
    internal_nest, code/recipes.py:2396-2409)."""
    out = df.withColumn(target, F.to_json(F.struct(*[F.col(c) for c in select])))
    return out.drop(*[c for c in select if c != target]) if drop else out


def op_ngram(df: DataFrame, select, n: list[int] | int = (2, 3)) -> DataFrame:
    """Selected string columns -> array of char n-grams of the
    normalized, tokenized value (reference internal_ngram,
    code/recipes.py:1972-1987; used to build blocking keys).  Multiple
    n values concatenate (reference default n=[2,3])."""
    sizes = [n] if isinstance(n, int) else list(n)
    cols = [select] if isinstance(select, str) else list(select)
    out = df
    for c in cols:
        normed = fn.normalize(F.col(c))
        parts = [fn.ngrams(normed, k) for k in sizes]
        arr = parts[0]
        for p in parts[1:]:
            arr = F.concat(arr, p)
        out = out.withColumn(c, arr)
    return out


def op_pivot(
    df: DataFrame,
    group_by: list[str] | str,
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    values: list | None = None,
) -> DataFrame:
    """Wide pivot: one output column per distinct ``pivot_col`` value,
    aggregated from ``value_col``.  Passing explicit ``values`` skips
    Spark's distinct-collection pre-pass (one extra job + driver
    materialization) — at 100 TB always pass them.  Spark lowers the
    pivot to two aggregates: the corpus-sized one shuffles once on
    ``(group_by, pivot_col)`` with map-side combine; the second
    shuffles only the reduced |groups| x |values| rows (verified on the
    physical plan).
    """
    from backend_spark.operators.groupby import _AGG

    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    if agg not in _AGG:
        raise ValueError(f"unknown aggregation: {agg}")
    g = df.groupBy(*keys)
    p = g.pivot(pivot_col, values) if values is not None else g.pivot(pivot_col)
    return p.agg(_AGG[agg](value_col))


def op_melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Long unpivot (inverse of pivot): ``stack`` emits one row per
    (id, value column) — a shuffle-free projection whose output is
    |rows| x |value_cols|, entirely inside whole-stage codegen; no
    shuffle, no Python.
    """
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.select(
        *id_cols,
        F.expr(
            f"stack({len(value_cols)}, {pairs}) AS (`{var_name}`, `{value_name}`)"
        ),
    )
