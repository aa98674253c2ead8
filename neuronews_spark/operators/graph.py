"""Graph metrics over the KG edge table: degrees, PageRank, component stats.

The reference computes these service-side over a Gremlin/Neptune graph
(``src/api/graph/metrics.py:190-255,431-760``, top-N influencers
``influence_network_analyzer.py:39-60``). Here they are iterative/keyed
DataFrame jobs over ``edges(src, dst)`` — no GraphFrames dependency, same
pattern as the CC operator (join + aggregate per round, localCheckpoint to
truncate lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(node_id, out_degree, in_degree, degree) over directed edges."""
    out_d = edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "node_id", "full")
        .select(
            "node_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Power-iteration PageRank with dangling-mass redistribution:
    rank' = (1-α)/N + α·(Σ_in rank/out_deg + dangling_mass/N).

    Fixed iteration count → deterministic; each round is one join + one
    aggregation, checkpointed. Returns (node_id, rank), Σ rank = 1.
    """
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node_id string, rank double")

    out_deg = edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, "node_id", "left")
        # dangling mass stays IN the plan as a broadcast 1-row aggregate:
        # a driver-side collect here would add a full job + sync barrier
        # per iteration — at cluster scale that doubles the job count.
        dangling = with_deg.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        contrib = (
            edges.join(
                with_deg.filter(F.col("out_deg").isNotNull()),
                edges["src"] == with_deg["node_id"],
            )
            .select(
                F.col("dst").alias("node_id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dangling))  # 1-row scalar join
            .select(
                "node_id",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("_dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            # checkpoint EVERY round: an un-checkpointed round would
            # re-execute inside both branches (dangling + contrib) of the
            # next round's plan — one blocking materialization per round
            # is the cheaper trade at any scale
            .localCheckpoint(eager=True)
        )
    return ranks


def top_influencers(edges: DataFrame, k: int = 10, **pr_kwargs) -> DataFrame:
    """Top-N by PageRank (influence_network_analyzer.py:55-60)."""
    return (
        pagerank(edges, **pr_kwargs)
        .orderBy(F.desc("rank"), F.asc("node_id"))
        .limit(k)
    )


def component_stats(components: DataFrame) -> DataFrame:
    """Cluster-size distribution of a (node_id, component) table — the
    graph-health metric the reference exposes as component counts."""
    sizes = components.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).alias("n_components")
    ).orderBy("size")
