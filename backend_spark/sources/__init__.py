"""Dataset readers / writers (reference: code/recipes.py:529-970, SURVEY.md §1.4).

The reference reads everything as strings with ``""`` as the null
sentinel (code/recipes.py:536-541) and writes nulls back as ``""``.
This engine uses real Spark types and real nulls internally; the
compatibility conventions are explicit reader/writer options:

* ``empty_as_null=True``  — on read, string "" -> null.
* ``null_as_empty=True``  — on write (csv/fwf), null -> "".
* ``all_strings=True``    — on read, force every column to string
  (the reference's dtype=object convention) so reference pipelines
  that rely on opt-in typing (`to_integer`/`to_float`) behave the same.

Formats: parquet, csv, jsonl, fwf (fixed-width — reference
code/recipes.py:77-108 `to_fwf`).  hdf/msgpack are pandas interchange
details with no Spark source — out of scope (SURVEY.md §1.4).
JDBC is a thin passthrough to spark.read.jdbc, gated on a driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _apply_empty_as_null(df: DataFrame) -> DataFrame:
    cols = [
        F.when(F.col(f.name) == "", None).otherwise(F.col(f.name)).alias(f.name)
        if f.dataType.simpleString() == "string"
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def _apply_all_strings(df: DataFrame) -> DataFrame:
    return df.select(*[F.col(f.name).cast("string").alias(f.name) for f in df.schema.fields])


def read_dataset(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    empty_as_null: bool = False,
    all_strings: bool = False,
    select: list[str] | None = None,
    header: bool = True,
    sep: str = ",",
    fwf_widths: list[tuple[str, int]] | None = None,
    schema=None,
) -> DataFrame:
    """Read a dataset.  ``select`` prunes columns at the source so
    Catalyst pushes the projection into the scan (ReadSchema)."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        # ORC is a first-class Spark source: same predicate pushdown /
        # column pruning / vectorized reader as parquet, common in Hive-
        # era lakes that a migration pipeline must ingest
        df = spark.read.orc(path)
    elif fmt == "csv":
        reader = spark.read.option("header", header).option("sep", sep)
        if schema is not None:
            reader = reader.schema(schema)
        # like the reference, csv arrives stringly unless a schema is given
        df = reader.csv(path)
    elif fmt in ("jsonl", "json"):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.json(path)
    elif fmt == "binary":
        # raw media ingestion for the multimodal operators: one row per
        # file (path, modificationTime, length, content binary) —
        # Spark's binaryFile source distributes file reads across
        # executors and prunes `content` when only metadata is
        # selected.  Pair with llm.decode_image_features /
        # extract_audio_features over the `content` column.
        df = spark.read.format("binaryFile").load(path)
    elif fmt == "text":
        # one row per line — the ingest for line-oriented raw crawls
        df = spark.read.text(path)
    elif fmt == "xml":
        # Spark 4 native XML source (no spark-xml jar needed): one row
        # per ``rowTag`` element, schema inferred or supplied — the
        # ingest path for feed/sitemap/legacy-ERP dumps
        reader = spark.read.format("xml").option("rowTag", "row")
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(path)
    elif fmt == "fwf":
        if not fwf_widths:
            raise ValueError("fwf requires fwf_widths=[(name, width), ...]")
        raw = spark.read.text(path)
        cols = []
        off = 1
        for name, width in fwf_widths:
            cols.append(F.trim(F.substring("value", off, width)).alias(name))
            off += width
        df = raw.select(*cols)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    if all_strings:
        df = _apply_all_strings(df)
    if empty_as_null:
        df = _apply_empty_as_null(df)
    if select:
        df = df.select(*select)
    return df


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    mode: str = "overwrite",
    null_as_empty: bool = False,
    header: bool = True,
    sep: str = ",",
    fwf_widths: list[tuple[str, int]] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write a dataset.  ``mode`` maps the reference's create/append
    (code/recipes.py:722-724) to overwrite/append; 'update' (ES upsert)
    needs a connector with merge semantics and is documented out of
    scope for the file formats."""
    if null_as_empty and fmt in ("csv", "fwf"):
        df = df.select(
            *[
                F.coalesce(F.col(f.name).cast("string"), F.lit("")).alias(f.name)
                if f.dataType.simpleString() == "string"
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "csv":
        # ignore*WhiteSpace default TRUE on write (unlike read): Spark
        # would silently trim leading/trailing spaces inside values —
        # the reference's pandas to_csv preserves them, so must we
        (
            writer.option("header", header)
            .option("sep", sep)
            .option("emptyValue", "")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .csv(path)
        )
    elif fmt in ("jsonl", "json"):
        writer.json(path)
    elif fmt == "fwf":
        if not fwf_widths:
            raise ValueError("fwf requires fwf_widths=[(name, width), ...]")
        # rpad each column to its width, concat into one line (reference
        # to_fwf: code/recipes.py:77-108)
        line = F.concat(
            *[F.rpad(F.coalesce(F.col(n).cast("string"), F.lit("")), w, " ") for n, w in fwf_widths]
        ).alias("value")
        df.select(line).write.mode(mode).text(path)
    elif fmt == "xml":
        writer.format("xml").option("rootTag", "rows").option("rowTag", "row").save(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def read_elasticsearch(spark: SparkSession, resource: str, **options) -> DataFrame:
    """Elasticsearch read via the es-hadoop connector
    (`org.elasticsearch.spark.sql`; reference ES reader,
    code/recipes.py:632-687).  Requires the elasticsearch-spark jar on
    the classpath — absent in this container, so this raises a clear
    error instead of a Py4J stack.  For a pure-Spark correctness path,
    model the index as a DataFrame and the match query as
    `operators.join_topk` (SURVEY.md §2.2)."""
    try:
        return (
            spark.read.format("org.elasticsearch.spark.sql")
            .options(**{"es.read.metadata": "true", **options})
            .load(resource)
        )
    except Exception as e:  # jar missing -> actionable message
        if not _is_missing_datasource(e):
            raise
        raise RuntimeError(
            "elasticsearch read needs the es-hadoop connector jar "
            "(spark.jars.packages=org.elasticsearch:elasticsearch-spark-30_2.13:<ver>); "
            f"underlying error: {e}"
        ) from e


def prepare_es_write(
    df: DataFrame,
    mode: str = "append",
    id_col: str | None = None,
    idempotent: bool = False,
    options: dict | None = None,
) -> tuple[DataFrame, str, dict]:
    """Resolve the reference's ES-write semantics (code/recipes.py:771-850)
    into es-hadoop options:

    * ``id_col`` — `_id` from a column (`es.mapping.id`);
    * ``idempotent=True`` without an id column — `_id` = sha256 row hash
      of the full row JSON (reference row-hash ids, :778-779), so
      re-running a job overwrites instead of duplicating;
    * ``mode='update'`` — upsert (`es.write.operation=upsert`), mapped
      onto the connector's append mode.

    Pure function (no ES needed) so the mapping is unit-testable without
    a cluster."""
    opts = dict(options or {})
    if idempotent and id_col is None:
        df = df.withColumn("__row_id", F.sha2(F.to_json(F.struct(*df.columns)), 256))
        id_col = "__row_id"
    if id_col:
        opts.setdefault("es.mapping.id", id_col)
    if mode == "update":
        opts.setdefault("es.write.operation", "upsert")
        mode = "append"
    return df, mode, opts


def write_elasticsearch(
    df: DataFrame,
    resource: str,
    mode: str = "append",
    id_col: str | None = None,
    idempotent: bool = False,
    **options,
) -> None:
    """ES bulk write (reference code/recipes.py:771-850).  Same jar
    requirement as `read_elasticsearch`; retry/backoff maps to
    es.batch.write.retry.count / .wait."""
    df, mode, opts = prepare_es_write(df, mode, id_col, idempotent, options)
    try:
        df.write.format("org.elasticsearch.spark.sql").options(**opts).mode(mode).save(resource)
    except Exception as e:
        if not _is_missing_datasource(e):
            raise
        raise RuntimeError(
            "elasticsearch write needs the es-hadoop connector jar; "
            f"underlying error: {e}"
        ) from e




def _coerce_schema(schema):
    """DDL string or StructType -> StructType (shared by the REST ES and
    embedded-SQL readers)."""
    from pyspark.sql.types import StructType

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if not isinstance(schema, StructType):
        raise ValueError("schema must be a StructType or DDL string")
    return schema



# -- REST Elasticsearch path (no jar; the reference itself talks plain
# -- HTTP via the elasticsearch-py client, code/recipes.py:632-687) ----


def _retry_sleep(seconds: float) -> None:
    """Backoff sleep behind a module-level seam: tests record the
    exponential schedule by patching THIS name — patching the global
    ``time.sleep`` also captures sleeps from unrelated background
    threads (py4j gateway keepalives etc.) and flakes under load."""
    import time

    time.sleep(seconds)


def _http_json(url: str, payload=None, method: str = "POST", retries: int = 3, backoff: float = 0.5):
    """Minimal urllib JSON call with the reference's retry+backoff
    (429/5xx retried, everything else raised).  Executor-safe: stdlib
    only, no session state."""
    import json as _json
    import urllib.error
    import urllib.request

    body = None
    headers = {"Content-Type": "application/json"}
    if payload is not None:
        if isinstance(payload, (bytes, str)):
            body = payload.encode() if isinstance(payload, str) else payload
            headers["Content-Type"] = "application/x-ndjson"
        else:
            body = _json.dumps(payload).encode()
    last = None
    for attempt in range(retries + 1):
        req = urllib.request.Request(url, data=body, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req) as resp:
                return _json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            if e.code not in (429, 502, 503, 504) or attempt == retries:
                raise
            last = e
            _retry_sleep(backoff * (2 ** attempt))
    raise last


def write_es_rest(
    df: DataFrame,
    url: str,
    index: str,
    id_col: str | None = None,
    batch: int = 500,
    op: str = "index",
    retries: int = 3,
) -> None:
    """Elasticsearch bulk write over plain REST — NO es-hadoop jar:
    every partition POSTs its rows to ``/_bulk`` in ndjson batches from
    the executor it lives on (``foreachPartition``), which is exactly
    the write parallelism the jar connector provides and the transport
    the reference uses (helpers.parallel_bulk over HTTP,
    code/recipes.py:771-850).  ``op``: ``index`` (create/replace) or
    ``update`` (doc-merge upsert).  Rows serialize via ``to_json`` on
    the JVM side, so Python touches only ready-made strings.  Raises on
    any item-level bulk error (fail-fast, like the reference's
    ``raise_on_error``)."""
    if op not in ("index", "update"):
        raise ValueError(f"op must be index|update, got {op!r}")
    if id_col is None:
        # deterministic row-hash ids (the prepare_es_write idempotency
        # rule): a 5xx retry or a Spark task retry then overwrites the
        # same _id instead of duplicating under ES auto-ids
        cols = df.columns
        payload = df.select(
            F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256).alias("__id"),
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("__doc"),
        )
    else:
        cols = [c for c in df.columns if c != id_col]
        payload = df.select(
            F.col(id_col).cast("string").alias("__id"),
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("__doc"),
        )
    base = url.rstrip("/")

    def _send(rows):
        import itertools
        import json as _json

        it = iter(rows)
        while True:
            chunk = list(itertools.islice(it, batch))
            if not chunk:
                break
            lines = []
            for r in chunk:
                action = {op: {"_id": r["__id"]}}
                lines.append(_json.dumps(action))
                lines.append(
                    _json.dumps({"doc": _json.loads(r["__doc"]), "doc_as_upsert": True})
                    if op == "update"
                    else r["__doc"]
                )
            resp = _http_json(
                f"{base}/{index}/_bulk", "\n".join(lines) + "\n", retries=retries
            )
            if resp.get("errors"):
                bad = [
                    i[op].get("error")
                    for i in resp.get("items", [])
                    if i.get(op, {}).get("error")
                ][:3]
                raise RuntimeError(f"elasticsearch bulk rejected items: {bad}")

    payload.foreachPartition(_send)


def read_es_rest(
    spark: SparkSession,
    url: str,
    index: str,
    schema,
    query: dict | None = None,
    n_slices: int = 4,
    batch: int = 1000,
    scroll: str = "2m",
) -> DataFrame:
    """Elasticsearch read over plain REST using SLICED SCROLL — the
    index is split server-side into ``n_slices`` independent scroll
    streams, one per Spark task, so the read parallelizes exactly like
    the jar connector's shard-partitioned scan (set ``n_slices`` ≈
    shard count).  ``schema`` declares the ``_source`` fields to keep
    (plus ``_id string`` if listed) — explicit schema, no inference
    pass.  The driver never touches document data; each task pages its
    own slice with ``batch``-sized scroll requests."""
    schema = _coerce_schema(schema)
    names = [f.name for f in schema.fields]
    base = url.rstrip("/")
    q = query or {"match_all": {}}

    def _fetch(iterator):
        import pandas as pd

        for pdf in iterator:
            for sid in pdf["slice_id"]:
                body = {"query": q, "size": batch}
                if n_slices > 1:
                    body["slice"] = {"id": int(sid), "max": n_slices}
                resp = _http_json(f"{base}/{index}/_search?scroll={scroll}", body)
                sc_id = None
                try:
                    while True:
                        hits = resp.get("hits", {}).get("hits", [])
                        if not hits:
                            break
                        rows = []
                        for h in hits:
                            doc = h.get("_source", {})
                            rows.append(
                                [h["_id"] if n == "_id" else doc.get(n) for n in names]
                            )
                        yield pd.DataFrame(rows, columns=names)
                        sc_id = resp.get("_scroll_id")
                        if not sc_id:
                            break
                        resp = _http_json(
                            f"{base}/_search/scroll", {"scroll": scroll, "scroll_id": sc_id}
                        )
                finally:
                    # free the server-side scroll context — they pin index
                    # segments until timeout and cap out on busy clusters
                    if sc_id:
                        try:
                            _http_json(
                                f"{base}/_search/scroll",
                                {"scroll_id": sc_id},
                                method="DELETE",
                            )
                        except Exception:
                            pass

    slices = spark.range(n_slices).select(F.col("id").cast("int").alias("slice_id")).repartition(n_slices)
    return slices.mapInPandas(_fetch, schema=schema)


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC read (reference `sql` connector, code/recipes.py:481-510).
    Partitioned reads via partitionColumn/lowerBound/upperBound/numPartitions
    options; requires the JDBC driver jar on the classpath."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite", **options) -> None:
    df.write.format("jdbc").option("url", url).option("dbtable", table).options(**options).mode(mode).save()


def configure_s3a(
    spark: SparkSession,
    access_key: str | None = None,
    secret_key: str | None = None,
    endpoint: str | None = None,
    path_style_access: bool | None = None,
    anonymous: bool = False,
) -> SparkSession:
    """Point the Hadoop s3a filesystem at an object store (the
    reference's s3 connector, code/recipes.py:111-246, rides boto-style
    credentials; Spark-side the same knobs are hadoop confs).  After
    this, every reader/writer in this module accepts ``s3a://`` paths —
    s3 is a *path scheme*, not a separate connector.  Needs the
    hadoop-aws + aws-sdk jars on the classpath at runtime; the conf
    surface itself is jar-free and contract-tested."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    if anonymous:
        hc.set(
            "fs.s3a.aws.credentials.provider",
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider",
        )
    if access_key is not None:
        hc.set("fs.s3a.access.key", access_key)
    if secret_key is not None:
        hc.set("fs.s3a.secret.key", secret_key)
    if endpoint is not None:
        hc.set("fs.s3a.endpoint", endpoint)
    if path_style_access is not None:
        hc.set("fs.s3a.path.style.access", "true" if path_style_access else "false")
    return spark


def read_mongodb(
    spark: SparkSession, uri: str, database: str, collection: str, **options
) -> DataFrame:
    """MongoDB read via the official Spark connector (format
    ``mongodb``; reference mongo connector, code/recipes.py — §2
    inventory item 45).  Requires the mongo-spark-connector jar
    (spark.jars.packages=org.mongodb.spark:mongo-spark-connector_2.13);
    absent in this container, so errors surface with the jar hint, and
    the option surface is pinned by jar-free contract tests."""
    try:
        return (
            spark.read.format("mongodb")
            .options(
                **{
                    "connection.uri": uri,
                    "database": database,
                    "collection": collection,
                    **options,
                }
            )
            .load()
        )
    except Exception as e:
        if not _is_missing_datasource(e):
            raise  # real connector errors (auth, URI, network) pass through
        raise RuntimeError(
            "mongodb read needs the mongo-spark-connector jar "
            "(spark.jars.packages=org.mongodb.spark:mongo-spark-connector_2.13:<ver>); "
            f"underlying error: {e}"
        ) from e


def write_mongodb(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    mode: str = "append",
    id_col: str | None = None,
    **options,
) -> None:
    """MongoDB write; ``id_col`` maps to the connector's ``idFieldList``
    so re-runs upsert on that key instead of duplicating (the same
    idempotency contract as :func:`prepare_es_write`)."""
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        **options,
    }
    if id_col:
        opts.setdefault("idFieldList", id_col)
        opts.setdefault("operationType", "replace")
    try:
        df.write.format("mongodb").options(**opts).mode(mode).save()
    except Exception as e:
        if not _is_missing_datasource(e):
            raise
        raise RuntimeError(
            "mongodb write needs the mongo-spark-connector jar; "
            f"underlying error: {e}"
        ) from e


def _is_missing_datasource(e: Exception) -> bool:
    """True when the error means the DataSource/its jar is absent from
    the classpath (vs a real connector error like bad auth or URI)."""
    msg = str(e)
    return (
        "Failed to find data source" in msg
        or "Failed to find the data source" in msg
        or "ClassNotFoundException" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
    )


def read_sql_query(
    spark: SparkSession, url: str, select: str, expert: bool = False, **options
) -> DataFrame:
    """Whole-query pushdown read — the reference's SQL 'expert' mode
    (code/recipes.py:487-499) runs the user's SELECT entirely inside the
    source database (COPY ... TO STDOUT as CSV) and streams the result.
    Spark-first, the same semantic is the JDBC ``query`` option: the
    SELECT executes source-side, Spark only ships the result set; the
    reference's CSV transport is a wire-format artifact the connector
    replaces.  ``expert=True`` reproduces the reference's documented
    coercion ('all typed columns will be converted to string') by
    casting every result column to string.  Partitioned-read options
    still apply for parallel result fetch."""
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", select)
        .options(**options)
        .load()
    )
    if expert:
        df = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    return df


def read_sql_local(
    spark: SparkSession,
    db_path: str,
    query: str,
    schema,
    partition_column: str | None = None,
    lower=None,
    upper=None,
    num_partitions: int = 4,
) -> DataFrame:
    """Partitioned read from an embedded SQL database file (DuckDB) —
    the no-driver-jar counterpart of :func:`read_jdbc` with the SAME
    partitioned-scan contract: given ``partition_column`` +
    ``lower``/``upper`` bounds, the query splits into
    ``num_partitions`` half-open range slices and every Spark task
    opens the file read-only and fetches only its slice — genuinely
    parallel, nothing streams through the driver.  Without a partition
    column the whole query runs in one task (same degradation as
    JDBC).  ``schema`` is explicit (DDL string or StructType), the
    :func:`read_es_rest` philosophy: no inference pass.

    The reference's `sql` connector is served three ways now: jar JDBC
    (`read_jdbc`), whole-query pushdown (`read_sql_query`), and this
    embedded path that needs nothing but the file.
    """
    schema = _coerce_schema(schema)
    names = [f.name for f in schema.fields]

    if partition_column is None:
        bounds = [(None, None)]
    else:
        if lower is None or upper is None:
            raise ValueError("partition_column needs lower and upper bounds")
        lo, hi = float(lower), float(upper)
        step = (hi - lo) / num_partitions
        bounds = [
            (lo + i * step, (lo + (i + 1) * step) if i < num_partitions - 1 else None)
            for i in range(num_partitions)
        ]
        # first/last slices are unbounded so out-of-range rows are kept,
        # matching Spark's JDBC partitioning semantics
        bounds[0] = (None, bounds[0][1])

    bdf = spark.createDataFrame(
        [(i, b[0], b[1]) for i, b in enumerate(bounds)],
        "part int, lo double, hi double",
    ).repartition(len(bounds), "part")

    def _fetch(iterator):
        import duckdb

        for pdf in iterator:
            for _, row in pdf.iterrows():
                con = duckdb.connect(db_path, read_only=True)
                try:
                    preds = []
                    # float() both bounds: pandas hands back numpy
                    # scalars whose repr (numpy>=2: "np.float64(..)")
                    # is not SQL
                    if row["lo"] is not None and not (row["lo"] != row["lo"]):
                        preds.append(f"{partition_column} >= {float(row['lo'])!r}")
                    if row["hi"] is not None and not (row["hi"] != row["hi"]):
                        preds.append(f"{partition_column} < {float(row['hi'])!r}")
                    where = f" WHERE {' AND '.join(preds)}" if preds else ""
                    out = con.execute(
                        f"SELECT * FROM ({query}) __q{where}"
                    ).df()
                finally:
                    con.close()
                yield out[names]

    return bdf.mapInPandas(_fetch, schema=schema)


def write_sql_local(
    df: DataFrame,
    db_path: str,
    table: str,
    mode: str = "overwrite",
    stage_path: str | None = None,
) -> None:
    """Load a DataFrame into an embedded SQL database (DuckDB):
    executors write the data as parquet (the distributed heavy
    lifting), then ONE driver-side ``INSERT ... FROM read_parquet``
    bulk-loads the staged files — the standard load path for
    single-writer embedded warehouses, where per-partition INSERTs
    would serialize on the writer lock anyway.  ``mode``:
    overwrite | append."""
    import shutil
    import tempfile

    import duckdb

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    # the stage must be visible to BOTH executors and the driver: on a
    # multi-node cluster pass a shared-filesystem stage_path — the
    # local tempdir default only works when driver and executors share
    # a machine (local mode)
    stage = stage_path or tempfile.mkdtemp(prefix="sg_sqlw_")
    try:
        df.write.mode("overwrite").parquet(stage)
        con = duckdb.connect(db_path)
        try:
            src = f"SELECT * FROM read_parquet('{stage}/*.parquet')"
            if mode == "overwrite":
                con.execute(f"CREATE OR REPLACE TABLE {table} AS {src}")
            else:
                con.execute(f"INSERT INTO {table} {src}")
        finally:
            con.close()
    finally:
        if stage_path is None:
            shutil.rmtree(stage, ignore_errors=True)


def join_es_msearch(
    df: DataFrame,
    url: str,
    index: str,
    query_template: dict,
    k: int = 10,
    batch: int = 100,
    retries: int = 3,
) -> DataFrame:
    """The reference's Elasticsearch join, operational-parity path
    (code/recipes.py:2265-2370): for every row, substitute the row's
    values into a declared query template (``{column}`` placeholders in
    string leaves — reference ``replace_dict``, tools.py:90-98),
    ``_msearch`` them in ``batch``-sized bulks against a live cluster
    over REST, and attach the top-``k`` hit bucket plus the
    reference's bookkeeping columns: ``hits`` (JSON array of
    ``{_id, _score, _source}``), ``matchid_hit_matches_unfiltered``
    (total match count) and ``hit_max_score``.  Explosion to rows then
    composes with the existing ``unfold``/``unnest`` operators, same
    as the reference pipeline — and the pure-Spark correctness twin of
    this op is ``operators.join_topk``.

    Scale: mapInPandas, so each PARTITION talks to ES from its own
    executor in ``batch``-bulk msearches (the reference's
    chunk_search), with the REST retry/backoff; no driver funnel.
    """
    import json as _json

    from pyspark.sql.types import StructType

    base = url.rstrip("/")
    in_schema = df.schema
    # copy the field list — StructType keeps the given list by reference
    # and .add() appends in place, which would mutate df's own schema
    out_schema = StructType(list(in_schema.fields)).add("hits", "string").add(
        "matchid_hit_matches_unfiltered", "long"
    ).add("hit_max_score", "double")
    in_names = [f.name for f in in_schema.fields]
    tmpl = _json.dumps(query_template)

    def _sub(row) -> dict:
        def walk(node):
            if isinstance(node, dict):
                return {kk: walk(vv) for kk, vv in node.items()}
            if isinstance(node, list):
                return [walk(x) for x in node]
            if isinstance(node, str):
                out = node
                for name in in_names:
                    ph = "{" + name + "}"
                    if ph in out:
                        out = out.replace(ph, str(row[name]))
                return out
            return node

        return walk(_json.loads(tmpl))

    def _search(iterator):
        import pandas as pd

        for pdf in iterator:
            for off in range(0, len(pdf), batch):
                part = pdf.iloc[off : off + batch]
                lines = []
                for _, row in part.iterrows():
                    lines.append(_json.dumps({"index": index}))
                    lines.append(_json.dumps({"query": _sub(row), "size": k}))
                resp = _http_json(
                    f"{base}/_msearch", "\n".join(lines) + "\n", retries=retries
                )
                buckets, counts, maxes = [], [], []
                for r in resp["responses"]:
                    hits = r.get("hits", {})
                    hl = hits.get("hits", [])
                    total = hits.get("total", {})
                    total_n = total.get("value") if isinstance(total, dict) else total
                    buckets.append(
                        _json.dumps(
                            [
                                {"_id": h["_id"], "_score": h.get("_score"),
                                 "_source": h.get("_source", {})}
                                for h in hl
                            ]
                        )
                    )
                    counts.append(int(total_n if total_n is not None else len(hl)))
                    maxes.append(max((h.get("_score") or 0.0 for h in hl), default=None))
                out = part.copy()
                out["hits"] = buckets
                out["matchid_hit_matches_unfiltered"] = counts
                out["hit_max_score"] = pd.array(maxes, dtype="float64")
                yield out

    return df.mapInPandas(_search, schema=out_schema)
