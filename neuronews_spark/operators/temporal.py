"""Temporal knowledge-graph queries over a timestamped edge-event table.

Re-hosts the reference's mutation-log queries
(``/root/reference/src/knowledge_graph/kg_updater.py:233-317``): the
updater records every added triple with a timestamp, and two query
helpers read the log — ``get_emerging_connections`` (triples added after
a cutoff, most recent ``limit``) and ``get_evolving_topics`` (entities
ranked by how many new MENTIONS edges they gained inside a window).

Spark shape: the mutation log is just an ``edge_events`` DataFrame
(subject_id, predicate, object_id, object_name, object_type, source_doc,
added_at) — the natural by-product of writing mention edges with event
time. Both queries are a partition-prunable time filter plus one
aggregation/top-k; on a date-partitioned lakehouse table the filter
reaches the scan (the reference's in-memory list scan becomes partition
pruning at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def emerging_connections(
    edge_events: DataFrame,
    since_days: int = 7,
    limit: int = 50,
) -> DataFrame:
    """Edges added in the trailing ``since_days`` window (relative to the
    log's max event time — self-calibrating, so the query is a pure
    function of the table), most recent ``limit`` under the total order
    (added_at desc, source_doc desc, object_id desc).

    kg_updater.py:233-273 semantics: one row per new edge with subject,
    predicate, object identity + naming and provenance columns."""
    mx = edge_events.agg(F.max("added_at").alias("m")).first()["m"]
    cutoff = F.lit(mx) - F.expr(f"INTERVAL {since_days} DAYS")
    # orderBy + limit compiles to TakeOrderedAndProject (per-partition
    # top-k + driver merge) — no global sort, no single-partition window
    return (
        edge_events.filter(F.col("added_at") >= cutoff)
        .orderBy(F.desc("added_at"), F.desc("source_doc"), F.desc("object_id"))
        .limit(limit)
    )


def evolving_topics(
    edge_events: DataFrame,
    window_days: int = 30,
    top_n: int = 20,
) -> DataFrame:
    """Entities ranked by newly-gained MENTIONS edges inside the trailing
    window (kg_updater.py:275-317): (entity_id, name, type,
    new_connections, n_docs, source_docs) — top ``top_n`` by count with a
    deterministic entity-id tiebreak. ``source_docs`` is the sorted
    comma-joined doc list (the reference returns the sorted set)."""
    mx = edge_events.agg(F.max("added_at").alias("m")).first()["m"]
    cutoff = F.lit(mx) - F.expr(f"INTERVAL {window_days} DAYS")
    agg = (
        edge_events.filter(F.col("added_at") >= cutoff)
        .groupBy("object_id", "object_name", "object_type")
        .agg(
            F.count(F.lit(1)).alias("new_connections"),
            F.countDistinct("source_doc").alias("n_docs"),
            F.array_join(
                F.array_sort(F.collect_set("source_doc")), ","
            ).alias("source_docs"),
        )
    )
    # top-k via TakeOrderedAndProject, then rank the ≤top_n survivors
    # (the window spans only the tiny result set, not the full aggregate)
    top = agg.orderBy(F.desc("new_connections"), F.asc("object_id")).limit(top_n)
    w = Window.orderBy(F.desc("new_connections"), F.asc("object_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("object_id").alias("entity_id"),
            F.col("object_name").alias("name"),
            F.col("object_type").alias("type"),
            "new_connections",
            "n_docs",
            "source_docs",
            "rank",
        )
    )
