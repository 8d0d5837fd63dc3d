"""Round-15 optimization internals: pins for the operator rewrites that
changed PLAN SHAPE without changing results (OPTIMIZATION_r15.md).

Each test targets the specific internal the optimization replaced —
spread_scan's fire/no-op guard, the argmin-aggregate tie-breaks that
replaced row_number windows, dedup_exact's single-aggregate row
survival, and the CC seed's head-start invariant.
"""

from pyspark.sql import functions as F

from backend_spark import llm
from backend_spark.operators.graph import connected_components
from backend_spark.operators.joins import fuzzy_match
from backend_spark.scale import spread_scan


def test_spread_scan_fires_only_when_underparallel(spark):
    target = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i, f"t{i}") for i in range(100)], "id long, t string")
    narrow = narrow.coalesce(1)
    out = spread_scan(narrow, by="id")
    assert out.rdd.getNumPartitions() == target
    # content is untouched (same multiset of rows)
    assert sorted((r.id, r.t) for r in out.collect()) == [(i, f"t{i}") for i in range(100)]
    # already-parallel input: provable no-op (same plan object)
    wide = narrow.repartition(target)
    assert spread_scan(wide) is wide


def test_spread_scan_round_robin_without_key(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "id long").coalesce(1)
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(50))


def test_fuzzy_match_argmin_tiebreak(spark):
    # two dictionary words at the SAME distance 1: the smaller word wins
    # (the old row_number window ordered (__d asc, __w asc); the
    # min(struct) aggregate must reproduce it exactly)
    left = spark.createDataFrame([("abcd",)], "k string")
    ref = spark.createDataFrame([("abcx",), ("abca",)], "w string")
    out = {r.k: r.m for r in fuzzy_match(left, ref, "k", "w", out_col="m").collect()}
    assert out == {"abcd": "abca"}
    # distance 0 beats distance 1 even when the d1 word sorts first
    ref2 = spark.createDataFrame([("aaaa",), ("abcd",)], "w string")
    out2 = {r.k: r.m for r in fuzzy_match(left, ref2, "k", "w", out_col="m").collect()}
    assert out2 == {"abcd": "abcd"}


def test_dedup_exact_survivor_keeps_all_columns(spark):
    # the min_by(row-struct) rewrite must carry EVERY column of the
    # surviving row, not just (id, text)
    df = spark.createDataFrame(
        [(5, "same", "keep5"), (1, "same", "keep1"), (3, "other", "keep3")],
        "doc_id long, text string, extra string",
    )
    out = {r.doc_id: r.extra for r in llm.dedup_exact(df, "doc_id", "text").collect()}
    assert out == {1: "keep1", 3: "keep3"}


def test_connected_components_seed_not_a_fixed_point(spark):
    # a path graph where the 1-hop min seed is NOT converged (node 5's
    # seed is 4, the true component min is 1): the loop must still run
    # to the fixed point, and every label must be the component minimum
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    cc = {r.node: r.comp for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
