"""Streaming day-2 ER: the canonical store grows across micro-batches
and later batches attach to entities founded by earlier ones."""

from __future__ import annotations

import hashlib
import os

from neuronews_spark.sources.tables import ParquetCatalog
from neuronews_spark.streaming.ingest import start_incremental_er

SCHEMA = "mention_id string, entity_type string, norm string"


def _new_id(etype: str, norm: str) -> str:
    return hashlib.md5(f"new:{etype}:{norm}".encode()).hexdigest()


def test_store_grows_and_later_batches_attach(spark, tmp_path):
    src = str(tmp_path / "mentions_src")
    os.makedirs(src)
    catalog = ParquetCatalog(spark, str(tmp_path / "warehouse"))

    def _write(rows, name):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    _write(
        [
            ("m1", "Organization", "acme rockets"),
            ("p1", "Person", "john smith"),
        ],
        "b1",
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = start_incremental_er(
        stream,
        catalog,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        _write(
            [
                ("m2", "Organization", "acme rocket"),   # fuzzy -> b1 entity
                ("m3", "Organization", "zeta systems"),  # new
            ],
            "b2",
        )
        q.processAllAvailable()
        _write(
            [
                ("m4", "Organization", "acme rockets"),  # exact -> b1 entity
                ("m5", "Person", "j smith"),             # person -> b1 entity
                ("m6", "Organization", "acme rocket"),   # exact via b2-registered form
            ],
            "b3",
        )
        q.processAllAvailable()
    finally:
        q.stop()

    res = {
        r["mention_id"]: (r["entity_id"], r["match_kind"])
        for r in catalog.read("resolutions").collect()
    }
    acme = _new_id("Organization", "acme rockets")
    smith = _new_id("Person", "john smith")
    zeta = _new_id("Organization", "zeta systems")
    assert res["m1"] == (acme, "new")
    assert res["p1"] == (smith, "new")
    # batch 2 fuzzy-attaches to the entity batch 1 FOUNDED
    assert res["m2"] == (acme, "fuzzy")
    assert res["m3"] == (zeta, "new")
    # batch 3: exact to founded id; person rule across batches; exact
    # via the surface form batch 2's fuzzy match REGISTERED
    assert res["m4"] == (acme, "exact")
    assert res["m5"] == (smith, "person")
    assert res["m6"] == (acme, "exact")

    store = {
        r["norm"]: r["entity_id"] for r in catalog.read("entity_store").collect()
    }
    # every resolved surface form is registered to its canonical id
    assert store["acme rockets"] == acme
    assert store["acme rocket"] == acme
    assert store["john smith"] == smith
    assert store["j smith"] == smith
    assert store["zeta systems"] == zeta


def test_replay_is_entity_id_stable(spark, tmp_path):
    """Re-merging a batch after its forms are registered yields the
    SAME entity assignment (the exactly-once invariant)."""
    catalog = ParquetCatalog(spark, str(tmp_path / "wh2"))
    from neuronews_spark.operators.incremental_er import attach_increment

    batch = spark.createDataFrame(
        [("m1", "Organization", "brand new thing")], SCHEMA
    )
    empty = spark.createDataFrame(
        [], "entity_id string, entity_type string, norm string"
    )
    first = attach_increment(empty, batch).collect()[0]
    assert first["match_kind"] == "new"
    # simulate the store after _register, then replay the same batch
    store = spark.createDataFrame(
        [(first["entity_id"], "Organization", "brand new thing")],
        "entity_id string, entity_type string, norm string",
    )
    replay = attach_increment(store, batch).collect()[0]
    assert replay["entity_id"] == first["entity_id"]
    assert replay["match_kind"] == "exact"


def test_restart_from_checkpoint_processes_only_new_batches(spark, tmp_path):
    """Stop the stream, restart with the same checkpoint dir: already-
    committed batches are not reprocessed, and the restarted query
    resolves new mentions against the store the first run built."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    catalog = ParquetCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    def _write(rows, name):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    def _start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        return start_incremental_er(stream, catalog, checkpoint_dir=ckpt)

    _write([("m1", "Organization", "acme rockets")], "b1")
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = {
        r["mention_id"]: r["batch_id"]
        for r in catalog.read("resolutions").collect()
    }
    assert set(first) == {"m1"}

    _write([("m2", "Organization", "acme rocket")], "b2")
    q = _start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["mention_id"]: (r["entity_id"], r["match_kind"], r["batch_id"])
        for r in catalog.read("resolutions").collect()
    }
    assert set(rows) == {"m1", "m2"}
    # m1 kept its original batch id — it was NOT reprocessed on restart
    assert rows["m1"][2] == first["m1"]
    # m2 fuzzy-attached to the entity the PRE-RESTART run founded
    assert rows["m2"][0] == _new_id("Organization", "acme rockets")
    assert rows["m2"][1] == "fuzzy"
