"""Stage checkpointing: resumable parquet materialization per pipeline stage.

The reference gets resumability from Structured Streaming checkpoints
(``stream_write_raw_exactly_once.py:46-47,122-129``). The batch analog here
(north rule: "resumable from checkpoint across blocking, scoring, and
clustering stages") is a manifest-guarded parquet table per stage:

  <workdir>/<stage>/data/        parquet output of the stage
  <workdir>/<stage>/MANIFEST.json  {"fingerprint": ..., "rows": ...}

A stage re-runs only when its input fingerprint (a caller-supplied string:
input paths + parameters) differs from the manifest; otherwise the stored
parquet is read back — so a killed run resumes after the last completed
stage, and each stage is idempotent (overwrite-on-rerun).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class StageCheckpoint:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    def _paths(self, stage: str) -> tuple[str, str]:
        base = os.path.join(self.workdir, stage)
        return os.path.join(base, "data"), os.path.join(base, "MANIFEST.json")

    def has(self, stage: str, fingerprint: str) -> bool:
        data, manifest = self._paths(stage)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as f:
                meta = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return meta.get("fingerprint") == fingerprint and os.path.exists(data)

    def read(self, stage: str) -> DataFrame:
        data, _ = self._paths(stage)
        return self.spark.read.parquet(data)

    def write(self, stage: str, df: DataFrame, fingerprint: str) -> DataFrame:
        """Materialize ``df``, stamp the manifest, return the re-read frame
        (reading back truncates lineage exactly like a streaming checkpoint
        truncates the WAL)."""
        data, manifest = self._paths(stage)
        base = os.path.dirname(manifest)
        if os.path.exists(base):
            shutil.rmtree(base)
        df.write.mode("overwrite").parquet(data)
        out = self.spark.read.parquet(data)
        rows = out.count()
        with open(manifest, "w") as f:
            json.dump({"fingerprint": fingerprint, "rows": rows, "stage": stage}, f)
        return out

    def run(self, stage: str, fingerprint: str, build) -> DataFrame:
        """Memoized stage execution: reuse the checkpoint when the
        fingerprint matches, else build + persist."""
        if self.has(stage, fingerprint):
            return self.read(stage)
        return self.write(stage, build(), fingerprint)
