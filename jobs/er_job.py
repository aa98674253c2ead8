"""spark-submit entrypoint for the ER pipeline (north rule: runs via
``spark-submit --py-files`` on multi-executor clusters).

Package the library once:

    python scripts/package_pyfiles.py            # → dist/neuronews_spark.zip

then submit the identical job at two cluster sizes (N and 4N executors):

    spark-submit --py-files dist/neuronews_spark.zip \
        --num-executors 8  jobs/er_job.py \
        --input  s3://bucket/transcripts/ \
        --output s3://bucket/er_out/ \
        --workdir s3://bucket/er_ckpt/

    spark-submit --py-files dist/neuronews_spark.zip \
        --num-executors 32 jobs/er_job.py ...      # same input → scaling

With ``--synthetic N`` the job generates N synthetic turns instead of
reading ``--input`` (the sandbox benchmark path). Prints a one-line JSON
summary (rows, entities, seconds, turns/sec) on completion.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="parquet/Iceberg path of transcripts")
    p.add_argument("--synthetic", type=int, default=0, help="generate N turns instead")
    p.add_argument("--output", required=True, help="output root (entities/, edges/)")
    p.add_argument("--workdir", default=None, help="checkpoint+lineage dir (resume)")
    p.add_argument(
        "--lineage-dir", default=None,
        help="lineage/metrics only (no stage checkpoints) — the monitored-"
        "but-not-resumable production mode",
    )
    p.add_argument("--max-block-size", type=int, default=1000)
    p.add_argument("--ratio-threshold", type=float, default=0.88)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("neuronews-er").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from neuronews_spark.operators.scoring import ScoringConfig
    from neuronews_spark.pipeline import EntityResolutionPipeline, PipelineConfig
    from neuronews_spark.sources.synthetic import synthetic_transcripts

    if args.synthetic:
        transcripts = synthetic_transcripts(spark, n_turns=args.synthetic)
        fingerprint = f"synthetic:{args.synthetic}"
    elif args.input:
        transcripts = spark.read.parquet(args.input)
        fingerprint = args.input
    else:
        p.error("one of --input / --synthetic is required")

    cfg = PipelineConfig(
        max_block_size=args.max_block_size,
        scoring=ScoringConfig(ratio_threshold=args.ratio_threshold),
        workdir=args.workdir,
        lineage_dir=args.lineage_dir,
    )
    t0 = time.perf_counter()
    result = EntityResolutionPipeline(spark, cfg).run(
        transcripts, fingerprint=fingerprint
    )
    result.entities.write.mode("overwrite").parquet(args.output + "/entities")
    result.mention_edges.write.mode("overwrite").parquet(args.output + "/edges")
    n_entities = spark.read.parquet(args.output + "/entities").count()
    n_turns = transcripts.count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "n_entities": n_entities,
                "sec": round(dt, 2),
                "turns_per_sec": round(n_turns / dt, 1),
                "executors": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
