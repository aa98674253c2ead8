"""spark-submit entrypoint for incremental (day-2) entity resolution:
attach a new mention batch to an EXISTING canonical store (the batch
form of the reference's per-ingest resolver loop,
kg_updater.update_from_document:193).

    spark-submit --py-files dist/neuronews_spark.zip \
        jobs/attach_job.py \
        --store    /warehouse/er_out/store/ \
        --mentions s3://bucket/mentions/2026-08-19/ \
        --output   s3://bucket/er_out/attach/2026-08-19/ \
        --update-store

``--store`` holds (entity_id, entity_type, norm) — one row per
registered surface form; a ``form_key`` column (entity_type:norm,
the merge key) is derived on first ``--update-store`` run if absent
and carried thereafter.  ``--mentions`` holds (mention_id,
entity_type, norm).  With ``--update-store`` the job also registers
every resolved (form → entity) pair back into the store (the
distributed ``EntityResolver._register``), so tomorrow's batch can
match entities founded today.  Store updates key on the form, so
re-running the same day's job is idempotent on entity assignment.

``--mentions``/``--output`` (and a read-only ``--store``) accept any
Hadoop-compatible URI; ``--update-store`` additionally requires the
store to live on a LOCAL filesystem path — the stage-then-swap
rewrite goes through ``ParquetCatalog`` (os.rename), which has no
object-store backend here (sources/tables.py:44).

Prints a one-line JSON summary with per-match-kind counts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="canonical store parquet")
    p.add_argument("--mentions", required=True, help="mention batch parquet")
    p.add_argument("--output", required=True, help="resolution output path")
    p.add_argument("--update-store", action="store_true")
    p.add_argument("--threshold", type=float, default=0.88)
    p.add_argument(
        "--scorer", choices=("difflib", "jaro_winkler"), default="difflib"
    )
    p.add_argument(
        "--embeddings", default=None,
        help="optional parquet (name, vector) keyed by normalized form — "
        "enables the resolver's embedding fallback stage",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # only stop a session this job itself created — under pytest the
    # fixture session must survive the call
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("neuronews-er-attach").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from neuronews_spark.operators.incremental_er import attach_increment
    from neuronews_spark.sources.tables import ParquetCatalog

    store = spark.read.parquet(args.store).select(
        "entity_id", "entity_type", "norm"
    )
    mentions = spark.read.parquet(args.mentions)
    embeddings = (
        spark.read.parquet(args.embeddings) if args.embeddings else None
    )
    t0 = time.perf_counter()
    res = attach_increment(
        store,
        mentions,
        threshold=args.threshold,
        scorer=args.scorer,
        name_embeddings=embeddings,
    ).localCheckpoint(eager=True)
    res.write.mode("overwrite").parquet(args.output)
    if args.update_store:
        import os

        store_dir = args.store.rstrip("/")
        catalog = ParquetCatalog(spark, os.path.dirname(store_dir))
        table = os.path.basename(store_dir)
        # stores seeded with only the documented 3 columns get the merge
        # key derived in place on first update (idempotent: stores this
        # job has already updated carry form_key and skip the rewrite)
        existing = catalog.read(table)
        if "form_key" not in existing.columns:
            catalog.overwrite(
                table,
                existing.withColumn(
                    "form_key", F.concat_ws(":", "entity_type", "norm")
                ),
            )
        forms = res.select(
            F.concat_ws(":", "entity_type", "norm").alias("form_key"),
            "entity_id",
            "entity_type",
            "norm",
        )
        catalog.merge_upsert(table, forms, key="form_key")
    kinds = {
        r["match_kind"]: r["n"]
        for r in res.groupBy("match_kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    dt = time.perf_counter() - t0
    n = sum(kinds.values())
    print(
        json.dumps(
            {
                "n_mentions": n,
                "by_kind": kinds,
                "sec": round(dt, 2),
                "mentions_per_sec": round(n / dt, 1) if dt > 0 else None,
            }
        )
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
