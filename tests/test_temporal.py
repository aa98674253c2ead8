"""Temporal KG queries (kg_updater.py:233-317 semantics)."""

from __future__ import annotations

from datetime import datetime, timedelta

from neuronews_spark.operators.temporal import emerging_connections, evolving_topics


def _events(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    # entity e1 mentioned in 3 recent docs, e2 in 1 recent, e3 only long ago
    for i, (obj, days) in enumerate(
        [("e1", 0), ("e1", 1), ("e1", 2), ("e2", 3), ("e3", 100)]
    ):
        rows.append(
            (
                f"document:d{i}", "MENTIONS", obj, f"name-{obj}", "CONCEPT",
                f"d{i}", t0 - timedelta(days=days),
            )
        )
    return spark.createDataFrame(
        rows,
        "subject_id string, predicate string, object_id string,"
        "object_name string, object_type string, source_doc string,"
        "added_at timestamp",
    )


def test_emerging_connections_window_and_limit(spark):
    ev = _events(spark)
    got = emerging_connections(ev, since_days=7, limit=2).collect()
    # window excludes the 100-day-old edge; limit keeps the 2 most recent
    assert len(got) == 2
    assert [r["source_doc"] for r in got] == ["d0", "d1"]
    assert all(r["object_id"] != "e3" for r in got)


def test_evolving_topics_ranking(spark):
    ev = _events(spark)
    got = evolving_topics(ev, window_days=30, top_n=10).collect()
    assert [r["entity_id"] for r in got] == ["e1", "e2"]  # e3 outside window
    top = got[0]
    assert top["new_connections"] == 3 and top["rank"] == 1
    assert top["source_docs"] == "d0,d1,d2"
    assert top["n_docs"] == 3
