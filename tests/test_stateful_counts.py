"""applyInPandasWithState running counters: state survives micro-batches."""

from __future__ import annotations

import os

from neuronews_spark.streaming.ingest import stateful_running_counts


def test_stateful_running_counts_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "cnt_src")
    os.makedirs(src)

    def _write(rows, name):
        spark.createDataFrame(rows, "entity string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    _write([("e1",), ("e1",), ("e2",)], "b1")
    stream = (
        spark.readStream.schema("entity string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = stateful_running_counts(stream, "entity")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cnt_out")
        .start()
    )
    try:
        q.processAllAvailable()
        _write([("e1",), ("e1",), ("e1",)], "b2")
        q.processAllAvailable()
        _write([("e2",), ("e3",), ("e3",), ("e3",), ("e3",)], "b3")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cnt_out").collect()
    finally:
        q.stop()

    # update-mode memory sink accumulates one emission per (key, batch);
    # the latest emission per key carries the folded running state
    latest = {}
    for r in rows:
        if (
            r["entity"] not in latest
            or r["batches_seen"] > latest[r["entity"]]["batches_seen"]
        ):
            latest[r["entity"]] = r

    assert latest["e1"]["running_total"] == 5
    assert latest["e1"]["batches_seen"] == 2
    assert latest["e1"]["batch_rows"] == 3  # last batch contributed 3
    assert latest["e2"]["running_total"] == 2
    assert latest["e2"]["batches_seen"] == 2
    assert latest["e3"]["running_total"] == 4
    assert latest["e3"]["batches_seen"] == 1
    # every emission is internally consistent: total never below batch
    assert all(r["running_total"] >= r["batch_rows"] for r in rows)
