"""Pairwise-F1 evaluation over labeled same-block pairs (the north metric).

The baseline metric is "pairwise F1 ≥ 0.99 on labeled transcript entity
pairs *(same blocking key)*": for every candidate pair that shares ≥1
blocking key, ground truth says whether the pair belongs to the same
entity; the pipeline's prediction is component equality. Precision /
recall / F1 are computed with DataFrame joins — no driver-side pair
materialization, so the harness itself scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_same_block_pairs(
    blocks: DataFrame, truth: DataFrame, max_block_size: int = 1000
) -> DataFrame:
    """blocks(block_key, node_id, ...) × truth(node_id, group_id) →
    distinct same-block pairs labeled ``is_match`` by group equality."""
    sizes = blocks.groupBy("block_key").count().filter(F.col("count") <= max_block_size)
    ok = blocks.join(sizes.select("block_key"), "block_key")
    t = truth.select("node_id", "group_id")
    lab = ok.select("block_key", "node_id").join(t, "node_id")
    a = lab.select(
        "block_key",
        F.col("node_id").alias("id_a"),
        F.col("group_id").alias("group_a"),
    )
    b = lab.select(
        "block_key",
        F.col("node_id").alias("id_b"),
        F.col("group_id").alias("group_b"),
    )
    return (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("group_a") == F.col("group_b")).alias("is_match"),
        )
        .distinct()
    )


def pairwise_scores(
    labeled_pairs: DataFrame, components: DataFrame
) -> dict[str, float]:
    """labeled_pairs(id_a, id_b, is_match) + components(node_id, component)
    → precision / recall / F1 of 'same component' as the match predictor."""
    ca = components.select(
        F.col("node_id").alias("id_a"), F.col("component").alias("comp_a")
    )
    cb = components.select(
        F.col("node_id").alias("id_b"), F.col("component").alias("comp_b")
    )
    j = (
        labeled_pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "is_match", (F.col("comp_a") == F.col("comp_b")).alias("predicted")
        )
    )
    agg = j.agg(
        F.sum(F.when(F.col("predicted") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("predicted") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("predicted") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"]), int(agg["fp"]), int(agg["fn"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pairs": int(agg["n_pairs"]),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
