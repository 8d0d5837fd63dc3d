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
            out = out.withColumn(c, F.coalesce(F.explode_outer(c), F.lit(fill_na)))
        else:
            out = out.withColumn(c, F.explode(c))
    return out


def op_unnest(df: DataFrame, select: str, prefix: str = "", drop: bool = True) -> DataFrame:
    """Struct / map / JSON-string column -> one column per key, optional
    prefix (reference internal_unnest, code/recipes.py:2378-2394).

    JSON strings are schema-inferred from the data (one pass over the
    column with schema_of_json_agg semantics via spark.read.json on the
    projected column), then star-expanded — keys stay deterministic.
    """
    dtype = dict(df.dtypes)[select]
    out = df
    if dtype == "string":
        spark = df.sparkSession
        schema = spark.read.json(df.select(select).rdd.map(lambda r: r[0] or "{}")).schema
        out = out.withColumn(select, F.from_json(F.col(select), schema))
        dtype = "struct"
    if dtype.startswith("map"):
        keys = sorted(
            r[0] for r in out.select(F.explode(F.map_keys(select)).alias("k")).distinct().collect()
        )
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
