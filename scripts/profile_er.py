"""Stage-by-stage ER profiling: where do the seconds go at a given scale?

Usage: python scripts/profile_er.py [n_turns] [cores]
Prints per-stage wall seconds + row counts, and the physical plan of the
candidate-pair join (the widest shuffle) for inspection.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neuronews_spark.session import pin_worker_thread_pools

pin_worker_thread_pools()

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
cores = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)

spark = (
    SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(cores * 2))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .appName("profile-er")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from neuronews_spark.operators.blocking import build_blocks, candidate_pairs
from neuronews_spark.operators.canonicalize import build_entities
from neuronews_spark.operators.clustering import components_for_vertices
from neuronews_spark.operators.conversations import assemble_conversations
from neuronews_spark.operators.mentions import distinct_vertices, extract_mentions
from neuronews_spark.operators.scoring import matched_edges, score_pairs
from neuronews_spark.sources.synthetic import synthetic_transcripts


def step(name, df):
    t0 = time.perf_counter()
    df = df.persist()
    n = df.count()
    dt = time.perf_counter() - t0
    print(f"{name:16s} {dt:8.2f}s  rows={n}")
    return df


t0 = time.perf_counter()
transcripts = step("generate", synthetic_transcripts(spark, n_turns=n_turns, turns_per_conv=20))
conversations = step("assemble", assemble_conversations(transcripts))
mentions = step("mentions", extract_mentions(conversations))
vertices = step("vertices", distinct_vertices(mentions))
blocks = step("blocks", build_blocks(vertices))
pairs, capped = candidate_pairs(blocks)
pairs = step("pairs", pairs)
scored = step("scored", score_pairs(pairs))
edges = step("edges", matched_edges(scored))
components = step(
    "components",
    components_for_vertices(
        vertices.select("node_id"),
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    ),
)
entities = step("entities", build_entities(vertices, components))
print(f"{'TOTAL':16s} {time.perf_counter() - t0:8.2f}s  ({n_turns / (time.perf_counter() - t0):.0f} turns/s)")

if os.environ.get("EXPLAIN"):
    print("\n=== candidate-pair join plan ===")
    pairs.explain("formatted")
spark.stop()
