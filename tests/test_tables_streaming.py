"""Lakehouse merge-upsert + streaming watermark-dedup semantics — ports of
the reference's pipeline DoD tests (test_upsert_idempotency.py,
test_watermark_deduplication.py:44-91,160-186)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pytest

from neuronews_spark.sources.tables import ParquetCatalog
from neuronews_spark.streaming.ingest import (
    start_dedup_to_memory,
    start_exactly_once_merge,
)

T0 = datetime(2026, 1, 10, 12, 0, 0)


# ------------------------------------------------------------------ tables

def test_merge_upsert_insert_then_update_version(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    batch1 = spark.createDataFrame(
        [("a", "t1", 1.0), ("b", "t2", 2.0)], "id string, title string, score double"
    )
    cat.merge_upsert("enriched", batch1, key="id", version_col="version")
    t = {r["id"]: r for r in cat.read("enriched").collect()}
    assert t["a"]["version"] == 1 and t["b"]["version"] == 1

    # re-upsert a (matched → overwrite + version bump), insert c
    batch2 = spark.createDataFrame(
        [("a", "t1-new", 9.0), ("c", "t3", 3.0)], "id string, title string, score double"
    )
    cat.merge_upsert("enriched", batch2, key="id", version_col="version")
    t = {r["id"]: r for r in cat.read("enriched").collect()}
    assert t["a"]["version"] == 2 and t["a"]["title"] == "t1-new"
    assert t["b"]["version"] == 1  # untouched
    assert t["c"]["version"] == 1
    # idempotency audit: no duplicate keys (upsert_enriched.py:209-227)
    assert cat.duplicate_audit("enriched", "id").count() == 0


def test_merge_upsert_dedups_source_latest_per_key(spark, tmp_path):
    # CDC pre-aggregation semantics (cdc_to_iceberg.py:197-240): when a
    # micro-batch contains several versions of one key, only the one with
    # max ts_ms lands
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [("k", "old", 100), ("k", "new", 200)], "id string, v string, ts_ms long"
    )
    cat.merge_upsert("cdc", batch, key="id", dedup_order="ts_ms")
    rows = cat.read("cdc").collect()
    assert len(rows) == 1 and rows[0]["v"] == "new"


def test_merge_upsert_rerun_is_idempotent(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame([("a", 1.0)], "id string, x double")
    cat.merge_upsert("t", batch, key="id")
    cat.merge_upsert("t", batch, key="id")
    assert cat.read("t").count() == 1
    assert cat.duplicate_audit("t", "id").count() == 0


# --------------------------------------------------------------- streaming

def _write_batch_file(spark, path: str, rows, name: str) -> None:
    df = spark.createDataFrame(
        rows, "id string, published_at timestamp, title string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, name))


def test_watermark_dedup_keeps_at_most_one_row_per_key(spark, tmp_path):
    """Port of test_watermark_deduplication.py:44-91: duplicate ids across
    micro-batches collapse; events > 2h late are dropped."""
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # batch 1: fresh events (watermark advances to max-2h)
    _write_batch_file(
        spark, src,
        [("k1", T0, "first"), ("k2", T0 + timedelta(minutes=5), "other")],
        "b1",
    )
    stream = (
        spark.readStream.schema("id string, published_at timestamp, title string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = start_dedup_to_memory(stream, "dedup_out")
    try:
        q.processAllAvailable()
        # batch 2: a duplicate of k1 (within watermark) and a 3h-late event
        _write_batch_file(
            spark, src,
            [
                ("k1", T0 + timedelta(minutes=10), "dup-within"),
                ("k3", T0 - timedelta(hours=3), "too-late"),
            ],
            "b2",
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()
    by_key: dict[str, int] = {}
    for r in rows:
        by_key[r["id"]] = by_key.get(r["id"], 0) + 1
    assert by_key.get("k1") == 1  # duplicate suppressed
    assert by_key.get("k2") == 1
    assert "k3" not in by_key  # >2h late → dropped
    assert max(by_key.values()) <= 1


def test_exactly_once_foreachbatch_merge(spark, tmp_path):
    """stream_write_raw_exactly_once.py:132-173: per-batch MERGE keyed by id
    is idempotent — duplicate deliveries don't duplicate rows."""
    src = str(tmp_path / "stream_src2")
    os.makedirs(src)
    _write_batch_file(spark, src, [("a", T0, "v1"), ("b", T0, "v1")], "b1")
    _write_batch_file(
        spark, src, [("a", T0 + timedelta(minutes=1), "v2"), ("c", T0, "v1")], "b2"
    )
    cat = ParquetCatalog(spark, str(tmp_path / "wh2"))
    stream = (
        spark.readStream.schema("id string, published_at timestamp, title string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = start_exactly_once_merge(
        stream, cat, "raw", key="id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    time.sleep(0.2)
    rows = {r["id"]: r for r in cat.read("raw").collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["title"] == "v2"  # later batch won the merge
    assert cat.duplicate_audit("raw", "id").count() == 0


def test_write_distribution_clusters_and_orders(spark, tmp_path):
    """Local write distribution/ordering (upsert_enriched.py:62-64 analog):
    rows hash-partition by the distribution column and come out sorted
    within every partition."""
    from pyspark.sql import functions as F

    from neuronews_spark.sources.tables import apply_write_distribution

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("bucket"), F.col("id").alias("id")
    )
    out = apply_write_distribution(df, "bucket", ["id"], num_partitions=4)
    parts = out.select(
        F.spark_partition_id().alias("pid"), "bucket", "id"
    ).collect()
    by_pid: dict[int, list] = {}
    buckets_per_pid: dict[int, set] = {}
    for r in parts:
        by_pid.setdefault(r["pid"], []).append(r["id"])
        buckets_per_pid.setdefault(r["pid"], set()).add(r["bucket"])
    # sorted within every partition
    assert all(ids == sorted(ids) for ids in by_pid.values())
    # each bucket lands in exactly one partition (hash distribution)
    seen: dict[int, int] = {}
    for pid, buckets in buckets_per_pid.items():
        for b in buckets:
            assert seen.setdefault(b, pid) == pid


def test_processing_time_trigger_merges(spark, tmp_path):
    """trigger(processingTime=...) wrapper still reaches exactly-once
    merge semantics (stream_write_raw_exactly_once.py:172)."""
    src = str(tmp_path / "stream_src3")
    os.makedirs(src)
    _write_batch_file(spark, src, [("x", T0, "v1")], "b1")
    cat = ParquetCatalog(spark, str(tmp_path / "wh3"))
    stream = (
        spark.readStream.schema("id string, published_at timestamp, title string")
        .parquet(src + "/*")
    )
    q = start_exactly_once_merge(
        stream, cat, "raw", key="id",
        checkpoint_dir=str(tmp_path / "ckpt3"),
        processing_time="1 seconds",
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if cat.read("raw").count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    assert {r["id"] for r in cat.read("raw").collect()} == {"x"}


def test_iceberg_ddl_and_merge_emitters():
    """VERDICT r1 rows 9-10: the string emitters mirror the reference's
    DDL/MERGE shapes (stream_write_raw_exactly_once.py:52-74,
    upsert_enriched.py:170-195)."""
    from neuronews_spark.sources.tables import iceberg_ddl, iceberg_merge_sql

    ddl = iceberg_ddl("db.raw", "id BIGINT, ts TIMESTAMP", "days(ts)")
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS db.raw (id BIGINT, ts TIMESTAMP)")
    assert "USING iceberg" in ddl and "PARTITIONED BY (days(ts))" in ddl
    assert "'write.parquet.compression-codec'='snappy'" in ddl
    assert "'write.distribution-mode'='hash'" in ddl

    m = iceberg_merge_sql("db.enriched", "id", ["id", "title", "version"])
    assert "MERGE INTO db.enriched t USING updates s ON t.id = s.id" in m
    # the key column is never in the UPDATE SET list
    assert "t.id = s.id " in m and "SET t.title = s.title, t.version = s.version" in m
    assert "INSERT (id, title, version) VALUES (s.id, s.title, s.version)" in m


def test_apply_write_distribution_clusters_and_orders(spark):
    """Local write-distribution analog: hash partitioning on the
    distribution column + sortWithinPartitions (upsert_enriched.py:62-64)."""
    from pyspark.sql import functions as F

    from neuronews_spark.sources.tables import apply_write_distribution

    df = spark.range(200).select(
        (F.col("id") % 4).alias("day"), (F.lit(199) - F.col("id")).alias("k")
    )
    out = apply_write_distribution(df, "day", ["k"], num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    parts = out.select("day", "k").rdd.glom().collect()
    for rows in parts:
        ks = [r["k"] for r in rows]
        assert ks == sorted(ks)  # ordered within every partition
        # all rows for one day land in one partition (hash clustering)
    day_parts = {}
    for i, rows in enumerate(parts):
        for r in rows:
            day_parts.setdefault(r["day"], set()).add(i)
    assert all(len(s) == 1 for s in day_parts.values())


# ---------------------------------------------------------------------------
# session_window sessionization (batch differential + streaming finalize)
# ---------------------------------------------------------------------------

def test_session_window_batch_matches_sessionize(spark):
    from neuronews_spark.operators.temporal import session_stats
    from neuronews_spark.streaming.ingest import session_window_stats

    rows = [
        (1, "u1", T0, 0.10),
        (2, "u1", T0 + timedelta(seconds=20), 0.20),
        (3, "u1", T0 + timedelta(seconds=2000), 9.99),  # > 30min? no: 33min gap
        (4, "u2", T0, 1.00),
        (5, "u2", T0 + timedelta(seconds=1799), 2.00),  # just under the gap
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id string, ts timestamp, value double"
    )
    via_window = {
        (r["user_id"], r["session_start"]): r
        for r in session_stats(df, "user_id", "ts", 1800, "event_id", "value").collect()
    }
    via_session_window = {
        (r["user_id"], r["session_start"]): r
        for r in session_window_stats(
            df, "user_id", "ts", gap="30 minutes", value_col="value"
        ).collect()
    }
    assert set(via_window) == set(via_session_window)
    for k in via_window:
        for c in ("n_events", "session_end", "sum_value_cents"):
            assert via_window[k][c] == via_session_window[k][c], (k, c)
    # window_end = last event + gap (session_window contract)
    u1_first = via_session_window[("u1", T0)]
    assert u1_first["window_end"] == T0 + timedelta(seconds=20 + 1800)


def test_session_window_streaming_emits_finalized_sessions(spark, tmp_path):
    from neuronews_spark.streaming.ingest import session_window_stats

    src = str(tmp_path / "sess_src")
    os.makedirs(src)

    def _write(rows, name):
        spark.createDataFrame(
            rows, "user_id string, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))

    _write(
        [("u1", T0, 1.0), ("u1", T0 + timedelta(seconds=10), 2.0)], "b1"
    )
    stream = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = session_window_stats(
        stream, "user_id", "ts", gap="30 minutes",
        value_col="value", watermark_delay="10 minutes",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing final yet: watermark hasn't passed session end + gap
        assert spark.sql("SELECT * FROM sess_out").count() == 0
        # a far-future event pushes the watermark past the first session
        _write([("u9", T0 + timedelta(hours=3), 0.5)], "b2")
        q.processAllAvailable()
        _write([("u9", T0 + timedelta(hours=6), 0.5)], "b3")
        q.processAllAvailable()
        rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM sess_out").collect()}
    finally:
        q.stop()
    # u1's session was emitted exactly once, finalized, with exact cents
    assert "u1" in rows
    assert rows["u1"]["n_events"] == 2
    assert rows["u1"]["sum_value_cents"] == 300
    assert rows["u1"]["session_start"] == T0
    assert rows["u1"]["session_end"] == T0 + timedelta(seconds=10)


def test_snapshot_diff_hand_case(spark):
    import hashlib

    from neuronews_spark.sources.tables import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "id bigint, text string",
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, ""), (5, "e")],
        "id bigint, text string",
    )
    got = {
        r["id"]: (r["change"], r["before_hash"], r["after_hash"])
        for r in snapshot_diff(old, new, "id").collect()
    }
    # fingerprints tag values '\x01'+v and NULL as '\x02', so a
    # NULL -> '' flip is a REAL change (id 4), not a silent no-op
    h = lambda s: hashlib.md5(("\x01" + s).encode()).hexdigest()  # noqa: E731
    h_null = hashlib.md5(b"\x02").hexdigest()
    # 1 removed, 5 added, 3+4 changed; 2 unchanged (absent)
    assert got == {
        1: ("removed", h("a"), None),
        3: ("changed", h("c"), h("c2")),
        4: ("changed", h_null, h("")),
        5: ("added", None, h("e")),
    }
