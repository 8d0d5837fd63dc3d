"""Entity resolution: matched-pair clustering + golden-record
survivorship.

The reference's matching pipeline stops at scored pairs / validated
links (code/recipes.py join steps + the validation UI); a production
ER deployment then needs the two downstream steps this module adds:
transitive closure of the accepted pairs into entity clusters, and a
per-attribute survivorship policy that collapses each cluster to one
canonical "golden" record (Talend/MDM terminology; see also Christen,
"Data Matching", ch. 6).

Scale shape: clustering is :func:`~backend_spark.operators.graph
.connected_components` (hash-min label propagation, O(diameter)
keyed-join rounds — dedup/ER clusters are tiny and shallow, so this
converges in 2-3 rounds in practice); survivorship is ONE groupBy on
the cluster id.  The ``mode`` rule folds a per-cluster value histogram
through ``array_sort`` so ties break deterministically (highest count,
then smallest value) — cluster sizes bound the array, and match
clusters are small by construction (a mega-cluster means the blocking
upstream is broken, which `skew_report` is for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_spark.operators.graph import connected_components

_RULES = ("first", "mode", "min", "max", "sum")


def er_resolve(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    survivorship: dict[str, str],
    pair_left: str = "left_id",
    pair_right: str = "right_id",
) -> DataFrame:
    """Resolve matched pairs into entities and build golden records.

    ``records``: one row per source record, unique ``id_col``.
    ``pairs``: accepted matches (``pair_left``, ``pair_right``) — e.g.
    thresholded ``join_fuzzy``/``join_topk`` output or validated links.
    ``survivorship``: attr -> rule, one of
      * ``first`` — the canonical record's value (min record id wins)
      * ``mode``  — most frequent non-null value, ties to the smallest
      * ``min`` / ``max`` / ``sum`` — plain aggregates over the cluster

    Returns one row per entity: ``entity_id`` (min member record id),
    ``n_members``, and one column per survivorship attr.  Unmatched
    records form singleton entities (self-loops are implicit: every
    record enters clustering, not just paired ones).
    """
    for attr, rule in survivorship.items():
        if rule not in _RULES:
            raise ValueError(f"unknown survivorship rule {rule!r} for {attr!r}")
        if attr not in records.columns:
            raise ValueError(f"survivorship attr {attr!r} not in records")
    edges = (
        pairs.select(F.col(pair_left).alias("src"), F.col(pair_right).alias("dst"))
        # self-loops: singletons keep a cluster label
        .unionByName(
            records.select(F.col(id_col).alias("src"), F.col(id_col).alias("dst"))
        )
    )
    comp = connected_components(edges)  # (node, comp)
    members = records.join(
        comp.withColumnRenamed("node", id_col), id_col, "inner"
    )
    aggs = [
        F.min(id_col).alias("entity_id"),
        F.count(F.lit(1)).alias("n_members"),
    ]
    for attr, rule in survivorship.items():
        if rule == "first":
            aggs.append(F.min_by(attr, F.col(id_col)).alias(attr))
        elif rule == "mode":
            # deterministic mode: fold the (value, count) histogram —
            # built per-cluster below — by (-count, value)
            aggs.append(
                F.get(  # null (not ANSI error) when the cluster is all-null
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col(f"__cnt_{attr}").isNotNull(),
                                F.struct(
                                    (-F.col(f"__cnt_{attr}")).alias("neg"),
                                    F.col(attr).alias("val"),
                                ),
                            )
                        )
                    ),
                    0,
                )["val"].alias(attr)
            )
        else:
            aggs.append(getattr(F, rule)(attr).alias(attr))

    mode_attrs = [a for a, r in survivorship.items() if r == "mode"]
    if mode_attrs:
        # one value-histogram window pass per mode attr (runs on the
        # same comp partitioning), then the groupBy folds it
        from pyspark.sql import Window

        for attr in mode_attrs:
            w = Window.partitionBy("comp", attr)
            members = members.withColumn(
                f"__cnt_{attr}",
                F.when(F.col(attr).isNotNull(), F.count(attr).over(w)),
            )
    return members.groupBy("comp").agg(*aggs).drop("comp")
