"""A/B the round-5 session knobs (shuffle=cores*4 + AQE floor cores*3)
against the round-4 ones (shuffle=cores*2, no floor) on the 32-core
suite path, same era, interleaved.

Round-5 sessions changed the default shuffle-partition count and added an
AQE coalescing floor to fix ragged waves on the narrow (1/4-core) scaling
legs.  The full-run1 per-query numbers regressed on several multi-stage
queries (corpus_prep +4.0 s, pattern_entities +3.7 s, doc_claims +2.5 s,
semdedup +1.2 s) but that run sat in a suppressed DRAM era, so this script
measures the knob effect directly: for each config it opens a fresh JVM,
warms each query once, times the second run, then closes the JVM; configs
alternate B,A,B,A so era drift cancels to first order.

Usage: python scripts/ab_shuffle_floor.py [reps]
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
QUERIES = [
    "pattern_entities",
    "doc_claims",
    "semdedup",
    "doc_embeddings",
    "corpus_prep",
    "stg_entities",
    "minhash_near_dups",
]


def _session(cores: int, shuffle: int, floor: int | None) -> SparkSession:
    b = (
        SparkSession.builder.appName(f"ab-{shuffle}-{floor}")
        .master(f"local[{cores}]")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    if floor is not None:
        b = b.config(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum", str(floor)
        )
    return b.getOrCreate()


def run_config(tag: str, shuffle: int, floor: int | None) -> dict:
    import __spark_entry__ as entrymod
    from neuronews_spark.operators import dedup as _dedup

    queries = entrymod.queries()
    spark = _session(CORES, shuffle, floor)
    out: dict[str, float] = {}
    try:
        spark.range(100_000).selectExpr("sum(id)").collect()
        for name in QUERIES:
            for timed in (False, True):
                t0 = time.perf_counter()
                with _dedup.cache_scope():
                    df = queries[name](spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                if timed:
                    out[name] = round(time.perf_counter() - t0, 2)
        import bench

        er_t, _ = bench._run_er_job(spark, 1_000_000)
        out["er_1m_sec"] = round(er_t, 2)
    finally:
        spark.stop()
    print(json.dumps({"tag": tag, "shuffle": shuffle, "floor": floor, **out}))
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    acc: dict[str, list] = {"A": [], "B": []}
    for _ in range(reps):
        acc["B"].append(run_config("B_r4", CORES * 2, None))
        acc["A"].append(run_config("A_r5", CORES * 4, CORES * 3))
    summary = {}
    for k in QUERIES + ["er_1m_sec"]:
        a = min(r[k] for r in acc["A"])
        b = min(r[k] for r in acc["B"])
        summary[k] = {"A_r5": a, "B_r4": b, "delta": round(a - b, 2)}
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
