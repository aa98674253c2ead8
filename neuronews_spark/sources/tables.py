"""Lakehouse table layer: parquet-backed catalog shim with MERGE-equivalent
idempotent upsert.

The reference persists to Iceberg with exactly-once MERGE
(``stream_write_raw_exactly_once.py:132-173``) and versioned enrichment
upserts (``upsert_enriched.py:164-207``: matched → overwrite fields +
``version = version + 1``; not matched → insert with version 1), then
audits idempotency with ``GROUP BY id HAVING count > 1`` (:209-227).

This sandbox has no Iceberg runtime jar, so the catalog shim implements the
same *semantics* over plain parquet: ``merge_upsert`` is the batch analog of
MERGE INTO (latest-per-key dedup of the source, key-join against the target,
version bump on match), writes are staged-then-swapped so a crashed writer
never leaves a half-table, and ``iceberg_merge_sql``/``iceberg_ddl`` emit
the exact SQL the same operators run against a configured Iceberg catalog.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def overwrite(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Stage-then-swap overwrite: idempotent, crash-safe."""
        final = self.path(table)
        stage = final + f".stage-{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(stage)
        if os.path.exists(final):
            old = final + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(final, old)
            os.rename(stage, final)
            shutil.rmtree(old)
        else:
            os.rename(stage, final)

    def merge_upsert(
        self,
        table: str,
        source: DataFrame,
        key: str,
        dedup_order: str | None = None,
        version_col: str | None = None,
    ) -> DataFrame:
        """MERGE INTO semantics (upsert_enriched.py:164-207):

          * source is first deduped to latest-per-key (``dedup_order``
            descending — the CDC pre-aggregation of cdc_to_iceberg.py:197-240)
          * matched target rows are replaced by the source row; if
            ``version_col`` is set, its value becomes target.version + 1
          * unmatched source rows insert with version 1
          * unmatched target rows are kept untouched

        Returns the merged table (also persisted). Re-running the same merge
        is a no-op apart from version bumps — idempotency is audited by
        ``duplicate_audit``.
        """
        src = source
        if dedup_order is not None:
            w = Window.partitionBy(key).orderBy(F.desc(dedup_order))
            src = (
                src.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            src = src.dropDuplicates([key])

        if not self.exists(table):
            out = src
            if version_col is not None:
                out = out.withColumn(version_col, F.lit(1))
            self.overwrite(table, out)
            return self.read(table)

        target = self.read(table)
        if version_col is not None:
            old_versions = target.select(
                F.col(key), F.col(version_col).alias("_old_v")
            )
            matched = (
                src.join(old_versions, key, "left")
                .withColumn(
                    version_col,
                    F.when(F.col("_old_v").isNotNull(), F.col("_old_v") + 1).otherwise(
                        F.lit(1)
                    ),
                )
                .drop("_old_v")
            )
        else:
            matched = src
        kept = target.join(src.select(key), key, "left_anti")
        merged = kept.unionByName(matched.select(*kept.columns))
        self.overwrite(table, merged)
        return self.read(table)

    def duplicate_audit(self, table: str, key: str) -> DataFrame:
        """upsert_enriched.py:209-227 — must return 0 rows after any merge."""
        return (
            self.read(table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
        )


def iceberg_ddl(
    table: str,
    schema_sql: str,
    partition_expr: str = "days(ts)",
) -> str:
    """The DDL these tables get on a real Iceberg catalog
    (stream_write_raw_exactly_once.py:52-74 pattern)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_sql}) "
        f"USING iceberg PARTITIONED BY ({partition_expr}) "
        f"TBLPROPERTIES ('write.format.default'='parquet', "
        f"'write.parquet.compression-codec'='snappy', "
        f"'write.distribution-mode'='hash')"
    )


def apply_write_distribution(
    df: "DataFrame",
    distribution_col: str,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> "DataFrame":
    """Local equivalent of Iceberg's write distribution/ordering
    (upsert_enriched.py:62-64: ``ALTER TABLE ... WRITE ORDERED BY
    published_at, id`` + ``write.distribution-mode=hash``): hash-
    repartition on the distribution column, then sort WITHIN partitions —
    no global sort, files come out clustered for scan-time pruning."""
    parts = (
        df.repartition(num_partitions, distribution_col)
        if num_partitions
        else df.repartition(distribution_col)
    )
    return parts.sortWithinPartitions(*order_cols)


def iceberg_merge_sql(table: str, key: str, columns: list[str]) -> str:
    """The MERGE these upserts run on a real Iceberg catalog
    (upsert_enriched.py:170-195 pattern)."""
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c != key)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {table} t USING updates s ON t.{key} = s.{key} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a table — the audit you
    run between corpus versions before retraining (which documents were
    added / removed / changed, feeding CDC-style downstream refresh).

    ``compare_cols`` (default: every shared non-key column) are the
    columns whose change makes a row "changed"; comparison is by md5 of
    the '\\x1f'-joined canonical string forms, so the emitted
    before/after fingerprints are engine-portable and null-safe: each
    value is tagged '\\x01'+string and NULL encodes as '\\x02', so a
    NULL → '' (or '' → NULL) flip in a compare column is a real change
    (the tags share no prefix, so no value can collide with the marker).

    Returns (key, change, before_hash, after_hash) with change ∈
    added | removed | changed — unchanged rows are NOT emitted (the
    diff of two 100 TB snapshots is usually small; emitting it, not the
    tables, is the point).  Plan: one full-outer hash join on the key,
    filters — no window, no sort.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c != key and c in new.columns
        ]

    def fp(df: DataFrame) -> Column:
        def tagged(c: str) -> Column:
            col = F.col(c).cast("string")
            return F.when(col.isNull(), F.lit("\x02")).otherwise(
                F.concat(F.lit("\x01"), col)
            )

        return F.md5(F.concat_ws("\x1f", *[tagged(c) for c in compare_cols]))

    o = old.select(F.col(key).alias("_k"), fp(old).alias("before_hash"))
    n = new.select(F.col(key).alias("_k"), fp(new).alias("after_hash"))
    joined = o.join(n, "_k", "full_outer")
    return joined.select(
        F.col("_k").alias(key),
        F.when(F.col("before_hash").isNull(), "added")
        .when(F.col("after_hash").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        "before_hash",
        "after_hash",
    ).filter(
        F.col("before_hash").isNull()
        | F.col("after_hash").isNull()
        | (F.col("before_hash") != F.col("after_hash"))
    )
