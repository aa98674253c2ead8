"""Batch file sources: CSV / JSON / parquet with extension-or-glob format
detection.

Re-hosts the reference's scraped-file ingestion surface
(``batch_write_raw.py:28-35`` and
``batch_write_raw_with_lineage.py:88-114``): a path like
``data/scraped/latest/*.csv`` is resolved by suffix (or the glob's
``*.ext``), CSV is read with a header row, JSON is JSON-Lines, and the
loaded frame can be stamped with the reference's processing-metadata
columns before the Iceberg append.

Scale notes (100-TB posture):

* Schema inference over CSV/JSON is a FULL EXTRA PASS over the input
  (Spark samples JSON, but CSV inference reads everything) — callers at
  scale pass ``schema=`` so the scan happens once, with column pruning
  still applied to parquet.  The reference's jobs rely on inference;
  this keeps that behavior when ``schema`` is omitted but makes the
  fast path explicit.
* ``multiLine`` stays False: JSON-Lines and non-embedded-newline CSV
  are splittable, so a single 1-TB file still fans out across
  executors.  Multi-line formats force one-task-per-file.
* CSV quoting/escaping is Spark's RFC-4180 default, so round-tripping
  text containing commas/quotes through ``df.write.csv(header=True)``
  is lossless for scalar columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["detect_format", "read_batch", "with_batch_metadata"]

_FORMATS = ("csv", "parquet", "json")


def detect_format(path: str) -> str:
    """Format from a path's suffix or its glob pattern — the reference's
    detection ladder (``batch_write_raw_with_lineage.py:90-105``):
    ``*.csv`` / ``*.parquet`` / ``*.json`` anywhere in the path wins when
    the path itself has no recognized suffix."""
    p = path.rstrip("/")
    for fmt in _FORMATS:
        if p.endswith(f".{fmt}"):
            return fmt
    for fmt in _FORMATS:
        if f"*.{fmt}" in p:
            return fmt
    raise ValueError(f"Unsupported file type: {path}")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Load a batch of scraped files.  ``fmt`` overrides detection;
    ``schema`` (StructType or DDL string) skips the inference pass; extra
    ``options`` pass through to the reader (e.g. ``timestampFormat``)."""
    fmt = fmt or detect_format(path)
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported file type: {fmt}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        # header=True is the reference's contract for scraped CSVs
        return reader.options(header=True, **options).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    return reader.options(**options).parquet(path)


def with_batch_metadata(
    df: DataFrame, job_name: str, lineage_enabled: bool = True
) -> DataFrame:
    """The reference's processing-metadata stamp
    (``batch_write_raw_with_lineage.py:110-114``): ingestion timestamp +
    job provenance columns appended before the table write."""
    return (
        df.withColumn("batch_processed_at", F.current_timestamp())
        .withColumn("processing_job", F.lit(job_name))
        .withColumn("lineage_enabled", F.lit(lineage_enabled))
    )
