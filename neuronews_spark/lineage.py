"""Per-stage, per-partition lineage + metrics table.

The reference emits OpenLineage run facets per Spark job
(``jobs/spark/openlineage_config.py:37-66``) and polls streaming progress
metrics. Here every pipeline stage appends rows to a parquet ``lineage``
table (north rule: "per-partition lineage + metrics written to Iceberg" —
parquet locally, same DataFrame writer against an Iceberg catalog):

  run_id, stage, metric, key, value, created_at

Per-partition row counts use ``spark_partition_id()`` so skew is visible in
the lineage table itself (which partitions carried the hot blocks).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageWriter:
    def __init__(self, spark: SparkSession, path: str, run_id: str | None = None):
        self.spark = spark
        self.path = path
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def _append(self, rows: list[tuple[str, str, str, float]]) -> None:
        now = float(time.time())
        df = self.spark.createDataFrame(
            [(self.run_id, s, m, k, float(v), now) for s, m, k, v in rows],
            "run_id string, stage string, metric string, key string, value double, created_at double",
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    def scalar(self, stage: str, metric: str, value: float, key: str = "") -> None:
        self._append([(stage, metric, key, float(value))])

    def partition_counts(self, stage: str, df: DataFrame) -> None:
        """Row count per physical partition — skew observability."""
        counts = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        self._append(
            [(stage, "partition_rows", str(r["pid"]), float(r["count"])) for r in counts]
        )

    def frame(self, stage: str, df: DataFrame, metric: str, key_col: str, value_col: str) -> None:
        """Append an arbitrary (key, value) frame, e.g. capped block sizes."""
        rows = [
            (stage, metric, str(r[key_col]), float(r[value_col]))
            for r in df.collect()
        ]
        if rows:
            self._append(rows)

    def read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame(
                [],
                "run_id string, stage string, metric string, key string, value double, created_at double",
            )
        return self.spark.read.parquet(self.path)
