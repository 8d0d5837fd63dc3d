"""Round-15 optimization internals: pins for the operator rewrites that
changed PLAN SHAPE without changing results (OPTIMIZATION_r15.md).

Each test targets the specific internal the optimization replaced —
spread_scan's fire/no-op guard, the argmin-aggregate tie-breaks that
replaced row_number windows, dedup_exact's single-aggregate row
survival, and the CC seed's head-start invariant.
"""

from pyspark.sql import functions as F

from backend_spark import functions as fn
from backend_spark import llm
from backend_spark.operators.graph import (
    connected_components,
    eigenvector_centrality,
    k_truss,
    label_propagation,
    pagerank,
    shortest_paths,
)
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


def test_label_propagation_argmax_tiebreak(spark):
    # node 3 sees labels {1, 2, 4, 5} once each in round 1 — the
    # min(struct(-count, label)) aggregate must reproduce the old
    # row_number (count desc, label asc) pick: smallest label 1 wins;
    # and a strict majority must beat a smaller minority label
    edges = spark.createDataFrame(
        [(3, 1), (3, 2), (3, 4), (3, 5)], "src long, dst long"
    )
    out = {r.node: r.community for r in label_propagation(edges, n_rounds=1).collect()}
    assert out[3] == 1  # tie on count=1 -> smallest neighbor label
    # majority case: node 0 has neighbors {7, 8, 9} all labeled 7 after
    # round 1 would need 2 rounds; simpler: star where two leaves share
    # a label via a triangle
    edges2 = spark.createDataFrame(
        [(0, 7), (0, 8), (0, 1), (7, 8)], "src long, dst long"
    )
    # round 1: node 0's neighbor labels are {7, 8, 1} (one each) -> 1;
    # nodes 7 and 8 see {0, 8, 7} resp {0, 7, 8} -> 0 each.  round 2:
    # node 0 sees lbl(7)=0, lbl(8)=0, lbl(1)=0 -> 0 by majority even
    # though label 1's holder is smaller
    out2 = {r.node: r.community for r in label_propagation(edges2, n_rounds=2).collect()}
    assert out2[0] == 0


def test_pagerank_tol_path_no_helper_columns(spark):
    # the inline-delta rewrite must not leak __d/__deg into the output,
    # and the converged ranks must be symmetric and sum to 1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    out = pagerank(edges, max_iter=50, tol=1.0e-9, round_to=None)
    assert out.columns == ["node", "pagerank"]
    ranks = {r.node: r.pagerank for r in out.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert ranks[2] == ranks[3] == ranks[4]
    assert ranks[1] > ranks[2]


def test_eigenvector_tol_path_converges_symmetric(spark):
    # ring of 4: every node symmetric -> 0.5 each after L2 norm; the
    # tol>0 path (inline __d delta, lazy cut) must converge and must
    # not leak helper columns
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    out = eigenvector_centrality(edges, max_iter=50, tol=1.0e-8)
    assert out.columns == ["node", "eigenvector"]
    vals = {r.node: r.eigenvector for r in out.collect()}
    assert vals == {1: 0.5, 2: 0.5, 3: 0.5, 4: 0.5}


def test_shortest_paths_multi_source_layers(spark):
    # path 1-2-3-4-5 from sources {1, 5}: the fused one-action-per-round
    # loop must still settle each BFS layer exactly once
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r.node: r.dist for r in shortest_paths(edges, sources=[1, 5]).collect()}
    assert out == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_k_truss_cascade_to_empty_and_supports(spark):
    # K4 on {1..4} + node 5 on {1,2,3}: at k=5 the peel cascades — round
    # 1 removes the support-2 edges, round 2 starves triangle {1,2,3} —
    # the count_if fused fixpoint read must drive the loop to empty
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (2, 5), (3, 5)]
    edges = spark.createDataFrame(e, "src long, dst long")
    assert k_truss(edges, k=5).count() == 0
    # two triangles sharing edge (2,3): all survive k=3 with exact supports
    edges2 = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    out = {(r.a, r.b): r.support for r in k_truss(edges2, k=3).collect()}
    assert out == {(1, 2): 1, (1, 3): 1, (2, 3): 2, (2, 4): 1, (3, 4): 1}


def test_connected_components_seed_not_a_fixed_point(spark):
    # a path graph where the 1-hop min seed is NOT converged (node 5's
    # seed is 4, the true component min is 1): the loop must still run
    # to the fixed point, and every label must be the component minimum
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "src long, dst long"
    )
    cc = {r.node: r.comp for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_kmeans_assign_argmin_tiebreak_smaller_cluster(spark):
    # three standard basis vectors form an EXACT equilateral set
    # (pairwise d² = 2.0, exact in binary floats): with k=2, n_iter=0,
    # whichever two points the hash-ranked init seeds, the third is
    # exactly tied between both centroids.  The old row_number window
    # ordered (__d asc, cluster asc) — the literal-array
    # array_min(struct(d, cluster)) must pick the SAME smaller cluster
    # index on the tie, and report the rounded d².
    df = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0]), ("b", [0.0, 1.0, 0.0]), ("c", [0.0, 0.0, 1.0])],
        "id string, vec array<float>",
    )
    out = {r.id: (r.cluster, r.dist) for r in
           llm.kmeans_assign(df, "id", "vec", k=2, n_iter=0).collect()}
    seeds = [i for i, (_, d) in out.items() if d == 0.0]
    others = [i for i, (_, d) in out.items() if d != 0.0]
    assert len(seeds) == 2 and len(others) == 1
    assert {out[s][0] for s in seeds} == {0, 1}
    # the tied point: d² = 2.0 from BOTH seeds -> smaller cluster wins
    assert out[others[0]] == (0, 2.0)


def test_hyperplane_coeff_literal_matches_md5_long(spark):
    # _hyperplane_bits now precomputes plane coefficients on the driver
    # (hashlib.md5 replica) instead of folding fn.md5_long per row —
    # the two must agree exactly for any (seed, p, j)
    import hashlib
    probes = [("band0", 0, 0), ("band3", 15, 63), ("plane", 5, 31), ("x_y", 2, 7)]
    rows = spark.createDataFrame(probes, "seed string, p int, j int").select(
        "seed", "p", "j",
        ((fn.md5_long(F.concat_ws("_", F.col("seed"), F.col("p").cast("string"),
                                  F.col("j").cast("string"))) % 20001 - 10000
          ).cast("double") / 10000.0).alias("engine")
    ).collect()
    for r in rows:
        h = int(hashlib.md5(f"{r.seed}_{r.p}_{r.j}".encode()).hexdigest()[:15], 16)
        assert float(h % 20001 - 10000) / 10000.0 == r.engine, (r.seed, r.p, r.j)


def test_embed_cosine_pairs_precomputed_norms_exact(spark):
    # the norm-split verify (try_divide(dot, na*nb)) must reproduce
    # fn.cosine_similarity bit-for-bit, including the zero-norm -> no
    # pair (NULL cosine) case, in BOTH the exact and banded paths
    data = [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.001]), (3, [0.0, 0.0, 0.0]),
            (4, [-1.0, -2.0, -3.0])]
    df = spark.createDataFrame(data, "vec_id int, embedding array<double>")
    exact = {(r.id1, r.id2): r.cosine for r in
             llm.embed_cosine_pairs(df, threshold=0.99, n_planes=0).collect()}
    assert (1, 2) in exact and exact[(1, 2)] >= 0.99
    assert all(3 not in pair for pair in exact)  # zero-norm never pairs
    banded = {(r.id1, r.id2): r.cosine for r in
              llm.embed_cosine_pairs(df, threshold=0.99).collect()}
    for pair, cos in banded.items():
        assert exact[pair] == cos  # banded candidates verify to the same cosine


def test_nb_score_mapinpandas_fold_matches_ordered_sql_fold(spark):
    # part-4 rewrite: the collected-model np.cumsum fold must equal the
    # old ordered collect_list fold bit-for-bit.  Replay the fold in
    # plain python (sequential float adds in position order) and demand
    # exact equality on the UNROUNDED reconstruction to 1e-12, plus the
    # tie-break/margin/single-label contracts.
    train = spark.createDataFrame(
        [("a", "x y x z"), ("a", "x x q"), ("b", "y z z w"), ("b", "z w w")],
        "label string, text string",
    )
    model = llm.nb_train(train, "label", "text")
    mrows = model.collect()
    lc = {(r.label, r.token): r.log_cond for r in mrows}
    prior = {r.label: r.log_prior for r in mrows}
    vocab = {r.token for r in mrows}
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "w w w y"), (3, "zzzz oov only"), (4, "q")],
        "id long, text string",
    )
    got = {r.id: r for r in llm.nb_score(docs, model, "id", "text").collect()}
    assert 3 not in got  # all-OOV doc absent
    for i, text in [(1, "x y z"), (2, "w w w y"), (4, "q")]:
        toks = [t for t in text.split() if t in vocab]
        per = []
        for lab in sorted(prior):
            s = 0.0
            for t in toks:
                s = s + lc[(lab, t)]  # sequential fold, position order
            per.append((-(prior[lab] + s), lab))
        per.sort()
        best_s, best_l = -per[0][0], per[0][1]
        margin = best_s - (-per[1][0])
        assert got[i].label == best_l
        assert got[i].score == round(best_s, 4)
        assert got[i].margin == round(margin, 4)
    # single-label model: margin must be NULL (the old lead() contract)
    one = llm.nb_train(train.where(F.col("label") == "a"), "label", "text")
    o = llm.nb_score(docs.where(F.col("id") == 1), one, "id", "text").collect()
    assert len(o) == 1 and o[0].margin is None


def test_bloom_filter_join_literal_and_fallback_paths_agree(spark):
    # part-4 rewrite: the literal-bitset probe (m_words <= 2^17) and the
    # broadcast-join fallback must produce the same exact result — both
    # are exactness-preserving, so both must equal the plain semi-join
    from backend_spark.scale import bloom_filter_join

    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(300)], "k long, payload string"
    )
    small = spark.createDataFrame([(i * 11,) for i in range(20)], "k long")
    expect = sorted(map(tuple, big.join(small, "k", "left_semi").collect()))
    lit_path = bloom_filter_join(big, small, "k", m_bits=1 << 10, k=3)
    assert sorted(map(tuple, lit_path.collect())) == expect
    # literal path plans ZERO bitset-word joins before the exact one
    plan = lit_path._jdf.queryExecution().executedPlan().toString()
    assert "__w" not in plan
    fallback = bloom_filter_join(big, small, "k", m_bits=1 << 28, k=3)
    assert sorted(map(tuple, fallback.collect())) == expect
    fplan = fallback._jdf.queryExecution().executedPlan().toString()
    assert "__w0" in fplan  # the join-table path actually exercised


def test_minhash_pairs_first_agree_dedups_without_distinct(spark):
    # continuation-session rewrite: the candidate `distinct` is replaced
    # by a first-agreeing-band predicate in the band join.  Identical
    # texts agree in EVERY band, so each duplicate pair must still come
    # out exactly once — and the plan must carry no aggregate (the old
    # distinct was the only one in this pipeline).
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "completely unrelated text with different words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = llm.minhash_lsh_pairs(
        df, "doc_id", "text", num_perm=16, bands=4, shingle_n=3,
        jaccard_threshold=0.5,
    ).collect()
    pairs = sorted((r.id1, r.id2) for r in out)
    assert pairs == [(1, 2), (1, 3), (2, 3)]  # each exactly once
    assert all(r.jaccard == 1.0 for r in out)
    plan = (
        llm.minhash_lsh_pairs(
            df, "doc_id", "text", num_perm=16, bands=4, shingle_n=3,
            jaccard_threshold=0.5,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Aggregate" not in plan  # the distinct really is gone


def test_minhash_prefix_prune_keeps_boundary_pair(spark):
    # the sorted-prefix overlap prune is exact: a pair sitting exactly ON
    # the jaccard threshold must survive.  9 shared 3-shingles out of 12
    # united ("abcdefghijk" vs a variant sharing its first 11 chars) is
    # checked against a python replay of the same shingle sets; every
    # verified pair's jaccard must match the replay bit-for-bit.
    rows = [(1, "abcdefghijklm"), (2, "abcdefghijklx"), (3, "zzzzyyyyxxxx")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(t, n=3):
        return {t[i : i + n] for i in range(len(t) - n + 1)}

    out = llm.minhash_lsh_pairs(
        df, "doc_id", "text", num_perm=16, bands=4, shingle_n=3,
        jaccard_threshold=0.05,
    ).collect()
    got = {(r.id1, r.id2): r.jaccard for r in out}
    a, b = shingles("abcdefghijklm"), shingles("abcdefghijklx")
    expect = round(len(a & b) / len(a | b), 6)
    # (1, 2) share all bands' worth of similarity; whether it IS a
    # candidate depends on banding, but identical prefixes make every
    # minhash of the shared shingles dominate — assert presence and
    # exact jaccard (the prune must not have dropped it)
    assert (1, 2) in got
    assert got[(1, 2)] == expect
