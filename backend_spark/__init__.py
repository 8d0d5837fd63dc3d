"""backend_spark — a PySpark-native analytics / entity-resolution engine.

A from-scratch, Spark-first re-expression of the capabilities of
matchID-project/backend (the reference engine is a pandas/multiprocessing
chunk pipeline; see SURVEY.md).  Everything here is declarative DataFrame
construction: Catalyst owns optimization, Tungsten owns execution, and the
reference's chunk loop / worker pool / write queue machinery simply does
not exist.

Layout:
  session      — SparkSession factory tuned for local[32] testing and
                 cluster-scale defaults (AQE, shuffle partitions).
  sources      — Dataset readers/writers (parquet/csv/jsonl/fwf) with the
                 reference's ""-as-null compatibility convention.
  functions    — the scalar function catalog (SURVEY.md §2.8) as Column
                 expressions; pandas_udf only where no builtin exists.
  expr         — two-tier `eval` expression compiler (SURVEY.md §2.1).
  operators    — dataflow operators (SURVEY.md §2.1-2.7): column ops,
                 groupby, reshaping, joins (strict/fuzzy/top-k), graph
                 (connected components / clique).
  llm          — large-scale training-data pipeline operators: dedup
                 (exact/MinHash-LSH/SimHash), similarity search
                 (brute-force + hyperplane-LSH ANN), text analysis,
                 multimodal column plumbing.
  streaming    — Structured Streaming equivalents (watermarked windowed
                 aggs, sessionization).
  plans        — the YAML recipe compiler (recipe tree -> DataFrame fn).
  ml           — build_model/apply_model re-ranking on pyspark.ml.
"""

__version__ = "0.3.0"
