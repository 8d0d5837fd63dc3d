"""Graph operators (reference `clique`, code/recipes.py:1989-2062;
SURVEY.md §2.7): connected components over the matched-pairs edge list,
component id/size and per-node metrics, left-joined back onto the rows.

The reference builds a transient networkx graph **per chunk** (local
components — an artifact of the chunk loop, SURVEY.md §4).  Here the
components are global, computed with an iterative min-label propagation
expressed entirely as DataFrame joins/aggregations:

* each iteration is one shuffle-join + one hash aggregate — both
  map-side combinable — followed by a **pointer-jumping** shortcut
  (``label(v) := label(label(v))``), so convergence is O(log diameter)
  even on adversarial path graphs, not O(diameter);
* lineage is truncated every iteration with ``localCheckpoint`` so the
  plan does not grow with iteration count;
* entity-resolution graphs are near-cliques (match groups), so in
  practice the loop exits after 2-4 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Edge list -> (node, component) with component = min node id of
    the component (deterministic, oracle-friendly; the reference's
    uuid-per-component is an opaque id, code/recipes.py:2035-2040).

    Works on any orderable node type (strings included).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    # undirected: both directions + self loops so isolated endpoints keep labels
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # candidate: the smallest label among each node's neighbors
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "node")
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("__chg"),
            )
        )
        # pointer jumping: label(v) := label(label(v)) — halves the depth
        # of label chains each round, making long paths O(log n)
        parents = stepped.select(
            F.col("node").alias("comp"), F.col("comp").alias("__gcomp")
        )
        new_labels = (
            stepped.join(parents, "comp", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("__gcomp"), F.col("comp"))).alias("comp"),
                (F.col("__chg") | (F.col("__gcomp") < F.col("comp"))).alias("__chg"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels


def op_clique(
    df: DataFrame,
    select: list[str],
    metrics: list[str] | None = None,
    prefix: str = "graph_",
) -> DataFrame:
    """Reference internal_clique (code/recipes.py:1989-2062): build the
    undirected graph whose edges are the two selected columns (matched
    pairs), compute connected components, and left-join back — every
    row gains ``graph_clique_id`` (component id = min node),
    ``graph_clique_size`` (distinct nodes in the component) and any of
    the optional per-node ``metrics`` (``degree`` supported; the
    reference's centrality metrics are optional extensions,
    SURVEY.md §2.7).

    Join-back key is the *first* selected column, like the reference
    (code/recipes.py:2056-2060).
    """
    a, b = select[0], select[1]
    cc = connected_components(df.select(a, b), src=a, dst=b)
    sizes = cc.groupBy("comp").agg(F.countDistinct("node").alias(f"{prefix}clique_size"))
    node_info = (
        cc.join(sizes, "comp")
        .select(
            F.col("node"),
            F.col("comp").alias(f"{prefix}clique_id"),
            F.col(f"{prefix}clique_size"),
        )
    )
    if metrics and "degree" in metrics:
        e = df.select(F.col(a).alias("x"), F.col(b).alias("y")).where(
            F.col("x").isNotNull() & F.col("y").isNotNull()
        )
        sym = e.unionByName(e.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct()
        deg = sym.groupBy("x").agg(F.countDistinct("y").alias(f"{prefix}degree")).withColumnRenamed("x", "node")
        node_info = node_info.join(deg, "node", "left")
    joined = df.join(node_info, df[a] == node_info["node"], "left").drop("node")
    return joined
