"""Tier-2 `eval` fallback: verbatim Python expression evaluation inside an
Arrow-vectorized pandas UDF (reference semantics: safeeval,
code/tools.py:232-246 — row fields are local variables, errors yield an
"Ooops" marker string rather than aborting the pipeline).

This is the guarantee that any reference expression still runs; tier 1
(compiler.py) is the fast path.  The helper library available inside
expressions mirrors the reference's `from tools import *` surface with
pure-python implementations.
"""

from __future__ import annotations

import hashlib
import math
import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F


# --- python implementations of the catalog (for expression use only) -------

def normalize(x):
    if x is None:
        return None
    if isinstance(x, (list, tuple)):
        return [normalize(v) for v in x]
    s = "".join(ch for ch in unicodedata.normalize("NFKD", str(x)) if ord(ch) < 128)
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def tokenize(x):
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        out = []
        for v in x:
            out.extend(tokenize(v))
        return out
    s = str(x).strip()
    return s.split() if s else []


def ngrams(x, n=3):
    out = []
    for t in tokenize(x):
        if len(t) <= n:
            out.append(t)
        else:
            out.extend(t[i : i + n] for i in range(len(t) - n + 1))
    return out


def flatten(x):
    out = []
    for v in x:
        if isinstance(v, (list, tuple)):
            out.extend(flatten(v))
        else:
            out.append(v)
    return out


def levenshtein(a, b):
    from backend_spark.functions import _damerau_py

    return _damerau_py(str(a), str(b))


def levenshtein_norm(a, b):
    al = a if isinstance(a, (list, tuple)) else [a]
    bl = b if isinstance(b, (list, tuple)) else [b]
    best = 0.0
    for x in al:
        for y in bl:
            x, y = str(x), str(y)
            lv = levenshtein(x, y)
            best = max(best, round(100 - 100 * lv / (1 + min(len(x), len(y)))) / 100)
    return best


def jw(a, b):
    from backend_spark.functions import _jaro_winkler_py

    al = a if isinstance(a, (list, tuple)) else [a]
    bl = b if isinstance(b, (list, tuple)) else [b]
    return max(_jaro_winkler_py(str(x), str(y)) for x in al for y in bl)


def geopoint(wkt):
    m = re.search(r"POINT\s*\(\s*(-?[\d.]+)\s+(-?[\d.]+)\s*\)", str(wkt))
    return (float(m.group(2)), float(m.group(1))) if m else None


def distance(a, b):
    pa, pb = geopoint(a), geopoint(b)
    if not pa or not pb:
        return None
    lat1, lon1 = map(math.radians, pa)
    lat2, lon2 = map(math.radians, pb)
    h = math.sin((lat2 - lat1) / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2
    return round(2 * 6371.0088 * math.asin(math.sqrt(h)), 1)


def sha1(x):
    return hashlib.sha1(str(x).encode()).hexdigest()


def sha256(x):
    return hashlib.sha256(str(x).encode()).hexdigest()


def float_val(x):
    try:
        return float(x)
    except (TypeError, ValueError):
        return 0.0


def parsedate(x, fmt="%Y%m%d"):
    import datetime

    try:
        return datetime.datetime.strptime(str(x), fmt)
    except (TypeError, ValueError):
        return None


def replace_dict(x, dic):
    # whole-value exact match only (reference tools.py:90-98) — not a
    # substring replace; non-string scalars pass through unchanged
    if isinstance(x, (list, tuple)):
        return [replace_dict(v, dic) for v in x]
    if isinstance(x, dict):
        return {k: replace_dict(v, dic) for k, v in x.items()}
    return dic.get(x, x) if isinstance(x, str) else x


def replace_regex(x, regex):
    if isinstance(x, (list, tuple)):
        return [replace_regex(v, regex) for v in x]
    s = str(x)
    for pat, repl in regex.items():
        s = re.sub(pat, repl, s)
    return s


from collections import OrderedDict  # noqa: E402  (conf idiom: OrderedDict.fromkeys)

SAFE_GLOBALS = {
    "re": re,
    "math": math,
    "OrderedDict": OrderedDict,
    "type": type,
    "next": next,
    "iter": iter,
    "isinstance": isinstance,
    "tuple": tuple,
    "json": __import__("json"),
    "datetime": __import__("datetime"),
    "unicodedata": unicodedata,
    "normalize": normalize,
    "tokenize": tokenize,
    "ngrams": ngrams,
    "flatten": flatten,
    "levenshtein": levenshtein,
    "levenshtein_norm": levenshtein_norm,
    "jw": jw,
    "geopoint": geopoint,
    "distance": distance,
    "sha1": sha1,
    "sha256": sha256,
    "float_val": float_val,
    "parsedate": parsedate,
    "replace_dict": replace_dict,
    "replace_regex": replace_regex,
    "len": len,
    "str": str,
    "int": int,
    "float": float,
    "bool": bool,
    "abs": abs,
    "round": round,
    "max": max,
    "min": min,
    "sum": sum,
    "sorted": sorted,
    "set": set,
    "list": list,
    "dict": dict,
    "zip": zip,
    "range": range,
    "enumerate": enumerate,
    "__builtins__": {},
}


def python_eval_column(expr: str, df, result_type: str = "string") -> Column:
    """Evaluate `expr` per row with row fields as locals (reference
    safeeval semantics) as an Arrow-batched pandas UDF.  Errors produce
    the reference's "Ooops" marker (code/recipes.py:1680-1686).

    Only the columns the expression actually references are shipped
    through Arrow (parsed from the AST) — on a wide table the transport
    cost is proportional to the expression, not the schema.
    """
    import ast as _ast

    code = compile(expr, "<eval>", "eval")
    tree = _ast.parse(expr, mode="eval")
    referenced = {n.id for n in _ast.walk(tree) if isinstance(n, _ast.Name)}
    names = [c for c in df.columns if c in referenced] or [df.columns[0]]

    import pandas as pd

    stringify = result_type == "string"

    def _core(*series):
        out = []
        for vals in zip(*series):
            loc = dict(zip(names, vals))
            try:
                v = eval(code, SAFE_GLOBALS, loc)
                if stringify and v is not None and not isinstance(v, str):
                    v = str(v)
                out.append(v)
            except Exception as e:  # reference keeps going, marks the cell
                out.append(f"Ooops: {e}" if stringify else None)
        return pd.Series(out, dtype=object)

    # pandas_udf needs an exact-arity signature with pd.Series hints —
    # generate one matching the referenced-column count.
    args = ", ".join(f"s{i}" for i in range(len(names)))
    ns = {"pd": pd, "_core": _core}
    exec(
        f"def _udf({', '.join(f's{i}: pd.Series' for i in range(len(names)))}) -> pd.Series:\n"
        f"    return _core({args})\n",
        ns,
    )
    udf = F.pandas_udf(result_type)(ns["_udf"])
    return udf(*[F.col(c) for c in names])


def python_exec(df, statements, schema=None):
    """`exec` operator (reference code/recipes.py:1636-1642): arbitrary
    Python against the whole chunk as `df` (a pandas DataFrame here).
    Runs per Arrow batch via mapInPandas — a barrier operator by design
    (documented unoptimizable; SURVEY.md §7).

    Output schema: inferred by executing the statements on a driver-side
    sample unless `schema` (DDL string) is given.
    """
    if isinstance(statements, str):
        statements = [statements]
    statements = list(statements)

    def _run(pdf):
        # compile worker-side: code objects don't ship through pickle
        import builtins

        loc = {"df": pdf, "pd": __import__("pandas"), "np": __import__("numpy")}
        for s in statements:
            exec(compile(s, "<exec>", "exec"), dict(SAFE_GLOBALS, __builtins__=builtins), loc)
        return loc["df"]

    if schema is None:
        sample = df.limit(100).toPandas()
        out_sample = _run(sample)
        spark = df.sparkSession
        schema = spark.createDataFrame(out_sample).schema

    def _map(batches):
        for pdf in batches:
            yield _run(pdf)

    return df.mapInPandas(_map, schema=schema)
