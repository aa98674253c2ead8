"""Per-stage wall-time profile of the ER pipeline at a given core count.

Usage: taskset -c 0-7 python scripts/profile_er_stages.py 8 4000000

Each stage is eagerly materialized (localCheckpoint(eager=True)) so the
timings isolate stage cost — the production pipeline uses lazy
checkpoints, so the absolute numbers differ slightly, but the RELATIVE
2-core vs 8-core per-stage scaling is the signal this script exists for.
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from neuronews_spark.session import pin_worker_thread_pools

pin_worker_thread_pools()

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cores = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = (
        SparkSession.builder.appName(f"er-profile-{cores}")
        .master(f"local[{cores}]")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from neuronews_spark.operators.blocking import build_blocks, candidate_pairs
    from neuronews_spark.operators.canonicalize import (
        build_entities,
        build_id_map,
        build_mention_edges,
    )
    from neuronews_spark.operators.clustering import components_for_vertices
    from neuronews_spark.operators.conversations import assemble_conversations
    from neuronews_spark.operators.mentions import distinct_vertices, extract_mentions
    from neuronews_spark.operators.scoring import ScoringConfig, matched_edges, score_pairs
    from neuronews_spark.pipeline import EntityResolutionPipeline
    from neuronews_spark.sources.synthetic import synthetic_transcripts

    # warmup (codegen, python workers)
    pipe_w = EntityResolutionPipeline(spark)
    r = pipe_w.run(synthetic_transcripts(spark, n_turns=5_000, turns_per_conv=20))
    r.entities.count()
    r.mention_edges.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def stage(name, build):
        t0 = time.perf_counter()
        df = build().localCheckpoint(eager=True)
        timings[name] = round(time.perf_counter() - t0, 2)
        return df

    t_all0 = time.perf_counter()
    transcripts = synthetic_transcripts(spark, n_turns=n_turns, turns_per_conv=20)
    conversations = stage("assemble", lambda: assemble_conversations(transcripts))
    mentions = stage("mentions", lambda: extract_mentions(conversations))
    vertices = stage("vertices", lambda: distinct_vertices(mentions))
    counts["vertices"] = vertices.count()
    pairs = stage(
        "blocking",
        lambda: candidate_pairs(
            build_blocks(vertices, n_hashes=16, bands=4), max_block_size=1000
        )[0],
    )
    counts["pairs"] = pairs.count()
    scored = stage("scoring", lambda: score_pairs(pairs, ScoringConfig()))
    edges = stage("edges", lambda: matched_edges(scored))
    counts["edges"] = edges.count()
    components = stage(
        "clustering",
        lambda: components_for_vertices(
            vertices.select("node_id"),
            edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        ),
    )
    entities = stage("entities", lambda: build_entities(vertices, components))
    counts["entities"] = entities.count()
    t0 = time.perf_counter()
    id_map = build_id_map(components, entities).localCheckpoint(eager=True)
    me = build_mention_edges(mentions, id_map)
    counts["mention_edges"] = me.count()
    timings["id_map_edges"] = round(time.perf_counter() - t0, 2)
    timings["TOTAL"] = round(time.perf_counter() - t_all0, 2)

    # also run the real pipeline end-to-end once, for the true total
    t0 = time.perf_counter()
    pipe = EntityResolutionPipeline(spark)
    res = pipe.run(synthetic_transcripts(spark, n_turns=n_turns, turns_per_conv=20))
    res.entities.count()
    res.mention_edges.count()
    timings["REAL_PIPELINE"] = round(time.perf_counter() - t0, 2)

    print(json.dumps({"cores": cores, "n_turns": n_turns, "timings": timings, "counts": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
