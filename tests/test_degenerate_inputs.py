"""ANSI-degenerate input gate.

Spark 4 runs with ANSI mode on, where a division whose divisor is a
data-derived zero THROWS (``DIVIDE_BY_ZERO``) instead of yielding
NULL/NaN — so any operator dividing by a quantity a legal-but-degenerate
input can zero out crashes the whole query.  This bug class produced
one defect per round three rounds running (float_val r12,
cosine_similarity zero vectors r13, tfidf_cosine idf-zero norms r14);
this module institutionalizes the check: every division-bearing
operator runs here against the degenerate input that zeroes its
divisor and must COMPLETE (NULL / guarded value / filtered row — any
non-crash contract its docstring states).

These are crash gates, not value oracles — value semantics live in the
operator suites and the DuckDB cross-checks.
"""

from pyspark.sql import functions as F


def test_cosine_similarity_zero_norm_yields_null(spark):
    from backend_spark import functions as fn

    df = spark.createDataFrame(
        [(0, [0.0, 0.0], [1.0, 2.0])], "i long, a array<double>, b array<double>"
    )
    row = df.select(
        fn.cosine_similarity(F.col("a"), F.col("b")).alias("c1"),
        fn.cosine_similarity(F.col("a"), F.col("a")).alias("c2"),
    ).collect()[0]
    assert row.c1 is None and row.c2 is None


def test_tfidf_cosine_zero_norm_docs_complete(spark):
    # max_df = N admits a term in every doc -> idf = ln(1) = 0 -> every
    # surviving weight quantizes to 0 -> zero squared norms -> 0/0
    from backend_spark import llm

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    out = llm.tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.0, max_df=3)
    assert out.collect() == []  # NULL cosine fails the threshold filter


def test_zscore_constant_column_yields_null(spark):
    from backend_spark.features import zscore

    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 5.0)], "id long, v double")
    rows = zscore(df, "v", out_col="z").collect()
    assert len(rows) == 3 and all(r.z is None for r in rows)


def test_histogram_constant_column_single_bin(spark):
    from backend_spark.features import histogram

    df = spark.createDataFrame([(i, 7.0) for i in range(10)], "id long, v double")
    rows = histogram(df, "v", bins=4).collect()
    assert sum(r.cnt for r in rows) == 10  # all rows land somewhere, no crash


def test_robust_scale_constant_column_zero(spark):
    from backend_spark.features import robust_scale

    df = spark.createDataFrame([(i, 3.0) for i in range(5)], "id long, v double")
    rows = robust_scale(df, "v").collect()
    assert len(rows) == 5  # MAD = 0 guarded, no crash


def test_node_metrics_degree_one_clustering(spark):
    # a single edge: both endpoints have degree 1 -> degree*(degree-1) = 0
    from backend_spark.operators.graph import node_metrics

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = node_metrics(edges, metrics=["degree", "clustering"]).collect()
    assert {r.node for r in rows} == {1, 2}
    assert all(r.clustering == 0.0 for r in rows)


def test_auc_single_class_yields_null(spark):
    from backend_spark.ml import auc_score

    df = spark.createDataFrame(
        [(0.9, 1.0), (0.1, 1.0), (0.5, 1.0)], "score double, label double"
    )
    row = auc_score(df, "score", "label").collect()[0]
    assert row.auc is None and row.n_neg == 0


def test_gini_all_zero_values_yields_null(spark):
    from backend_spark.features import gini

    df = spark.createDataFrame(
        [("g", 0.0), ("g", 0.0), ("g", 0.0)], "grp string, v double"
    )
    row = gini(df, "grp", "v").collect()[0]
    assert row.gini is None and row.n == 3


def test_modularity_empty_edges_no_crash(spark):
    from backend_spark.operators.graph import modularity

    edges = spark.createDataFrame([], "src long, dst long")
    communities = spark.createDataFrame([(1, 1)], "node long, community long")
    rows = modularity(edges, communities).collect()
    assert len(rows) <= 1  # empty or NULL-modularity row, never a throw


def test_semdedup_cluster_cap_fails_fast(spark, monkeypatch):
    # the quadratic half of semdedup is Σ cluster_size²; the cap must
    # raise with the offending cluster before the pair join runs, and a
    # generous cap must not change results
    import pytest

    from backend_spark import llm

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="cluster"):
        llm.semdedup(emb, n_clusters=2, max_cluster_size=3).collect()
    capped = llm.semdedup(emb, n_clusters=2, max_cluster_size=1000).collect()
    uncapped = llm.semdedup(emb, n_clusters=2, max_cluster_size=None).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    # defaults match the explicit-None opt-out on an in-budget corpus
    assert sorted(map(tuple, llm.semdedup(emb, n_clusters=2).collect())) == sorted(
        map(tuple, uncapped)
    )
    # round-15 (the round-14 verdict's #1): the guard is DEFAULT-ON —
    # with the budget constant shrunk below a cluster's size, calling
    # with no max_cluster_size argument at all must fail fast (parity
    # with tfidf_cosine's default-on guard), and the documented opt-out
    # (max_cluster_size=None) must still run the quadratic plan
    monkeypatch.setattr(llm, "_SEMDEDUP_CLUSTER_LIMIT", 3)
    with pytest.raises(ValueError, match="max_cluster_size"):
        llm.semdedup(emb, n_clusters=2).collect()
    opted_out = llm.semdedup(emb, n_clusters=2, max_cluster_size=None).collect()
    assert sorted(map(tuple, opted_out)) == sorted(map(tuple, uncapped))
    # a misspelled sentinel must fail with the valid values named, not
    # an opaque str-vs-int TypeError deep inside the cap check
    with pytest.raises(ValueError, match="unrecognized"):
        llm.semdedup(emb, n_clusters=2, max_cluster_size="Auto")
    # the undersized-n_clusters raise names the actionable remedy
    with pytest.raises(ValueError, match="n_clusters"):
        llm.semdedup(emb, n_clusters=1, max_cluster_size=5).collect()


def test_ks_test_empty_side_yields_null(spark):
    # a group whose rows all carry one sample label: n_b = 0 -> the
    # d_stat CASE guard must short-circuit the 0/0 under ANSI
    from backend_spark.features import ks_test

    df = spark.createDataFrame(
        [("g1", "a", 1.0), ("g1", "a", 2.0), ("g2", "a", 1.0), ("g2", "b", 2.0)],
        "grp string, s string, v double",
    )
    rows = {r.grp: r for r in ks_test(df, "s", "v", "a", "b", by="grp").collect()}
    assert rows["g1"].n_b == 0 and rows["g1"].d_stat is None
    assert rows["g2"].d_stat is not None


def test_levenshtein_norm_empty_strings(spark):
    from backend_spark import functions as fn

    df = spark.createDataFrame([("", ""), ("", "abc")], "a string, b string")
    rows = df.select(fn.levenshtein_norm(F.col("a"), F.col("b")).alias("s")).collect()
    assert rows[0].s is not None and rows[1].s is not None


def test_jw_empty_strings(spark):
    from backend_spark import functions as fn

    df = spark.createDataFrame([("", ""), ("", "abc")], "a string, b string")
    rows = df.select(fn.jw(F.col("a"), F.col("b")).alias("s")).collect()
    assert all(r.s is not None for r in rows)
