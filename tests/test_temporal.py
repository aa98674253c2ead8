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


# ---------------------------------------------------------------------------
# as-of join / sessionization (training-pipeline temporal ops)
# ---------------------------------------------------------------------------

from neuronews_spark.operators.temporal import asof_join, session_stats, sessionize


def _ts(s):
    return datetime(2024, 1, 1) + timedelta(seconds=s)


def test_asof_join_hand_computed(spark):
    probe = spark.createDataFrame(
        [
            (1, "u1", _ts(10), 1.0),   # after b@5 and b@10 -> equal-ts b2 wins
            (2, "u1", _ts(4), 1.0),    # before any build -> null
            (3, "u1", _ts(100), 1.0),  # latest build overall -> b@60
            (4, "u2", _ts(50), 1.0),   # other key -> its own build b@7
            (5, "u3", _ts(50), 1.0),   # key with no build rows -> null
        ],
        "event_id int, user_id string, ts timestamp, value double",
    )
    build = spark.createDataFrame(
        [
            (101, "u1", _ts(5), 5.5),
            (102, "u1", _ts(10), 6.5),   # same ts as probe 1: >= matches it
            (103, "u1", _ts(60), 7.5),
            (104, "u2", _ts(7), 8.5),
        ],
        "event_id int, user_id string, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r
        for r in asof_join(
            probe, build, on="user_id", ts_col="ts",
            payload_cols=["event_id", "value"], tiebreak="event_id",
            prefix="m_",
        ).collect()
    }
    assert len(got) == 5
    assert got[1]["m_event_id"] == 102 and got[1]["m_value"] == 6.5
    assert got[2]["m_event_id"] is None and got[2]["m_ts"] is None
    assert got[3]["m_event_id"] == 103 and got[3]["m_ts"] == _ts(60)
    assert got[4]["m_event_id"] == 104
    assert got[5]["m_event_id"] is None
    # probe columns survive untouched
    assert got[1]["value"] == 1.0 and got[1]["ts"] == _ts(10)


def test_asof_join_build_ts_tie_breaks_by_greatest_tiebreak(spark):
    probe = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id int, user_id string, ts timestamp"
    )
    build = spark.createDataFrame(
        [(7, "u1", _ts(10)), (9, "u1", _ts(10)), (8, "u1", _ts(10))],
        "event_id int, user_id string, ts timestamp",
    )
    got = asof_join(
        probe, build, on="user_id", ts_col="ts",
        payload_cols=["event_id"], tiebreak="event_id",
    ).collect()
    assert got[0]["matched_event_id"] == 9


def test_sessionize_gap_strictly_greater(spark):
    # gap of exactly 30s does NOT split; 30.000001s does
    rows = [
        (1, "u1", _ts(0), 1.00),
        (2, "u1", _ts(30), 2.00),          # gap == 30 -> same session
        (3, "u1", _ts(60, ), 3.00),        # gap == 30 -> same session
        (4, "u1", _ts(91), 4.00),          # gap 31   -> new session
        (5, "u2", _ts(0), 5.00),           # first event of key -> session 1
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id string, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, "user_id", "ts", 30, "event_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_session_stats_exact_cents(spark):
    df = spark.createDataFrame(
        [
            (1, "u1", _ts(0), 0.10),
            (2, "u1", _ts(5), 0.20),   # 0.1+0.2 != 0.3 in binary; cents exact
            (3, "u1", _ts(1000), 9.99),
        ],
        "event_id int, user_id string, ts timestamp, value double",
    )
    got = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(df, "user_id", "ts", 30, "event_id", "value").collect()
    }
    s1 = got[("u1", 1)]
    assert s1["n_events"] == 2 and s1["sum_value_cents"] == 30
    assert s1["session_start"] == _ts(0) and s1["session_end"] == _ts(5)
    assert got[("u1", 2)]["sum_value_cents"] == 999


from neuronews_spark.operators.temporal import funnel_counts, funnel_stage_times


def test_funnel_requires_stage_order(spark):
    rows = [
        # u1: full ordered funnel
        (1, "u1", _ts(0), "signup"), (2, "u1", _ts(10), "click"),
        (3, "u1", _ts(20), "purchase"),
        # u2: click BEFORE signup does not qualify -> stops at signup
        (4, "u2", _ts(0), "click"), (5, "u2", _ts(10), "signup"),
        (6, "u2", _ts(20), "purchase"),  # no qualifying click -> no purchase
        # u3: purchase before first qualifying click -> stops at click
        (7, "u3", _ts(0), "signup"), (8, "u3", _ts(5), "purchase"),
        (9, "u3", _ts(10), "click"),
        # u4: never signs up
        (10, "u4", _ts(0), "click"), (11, "u4", _ts(5), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id int, user_id string, ts timestamp, event_type string"
    )
    stages = ["signup", "click", "purchase"]
    per = {
        r["user_id"]: r
        for r in funnel_stage_times(
            df, "user_id", "ts", "event_type", stages, "event_id"
        ).collect()
    }
    assert per["u1"]["t_purchase"] == _ts(20)
    assert per["u2"]["t_signup"] == _ts(10)
    assert per["u2"]["t_click"] is None and per["u2"]["t_purchase"] is None
    assert per["u3"]["t_click"] == _ts(10) and per["u3"]["t_purchase"] is None
    assert per["u4"]["t_signup"] is None

    got = {
        r["stage"]: r
        for r in funnel_counts(
            df, "user_id", "ts", "event_type", stages, "event_id"
        ).collect()
    }
    assert got["signup"]["n_reached"] == 3 and got["signup"]["conversion"] == 1.0
    assert got["click"]["n_reached"] == 2
    assert got["click"]["conversion"] == round(2 / 3, 6)
    assert got["purchase"]["n_reached"] == 1
    assert got["purchase"]["conversion"] == 0.5
    assert [got[s]["ordinal"] for s in stages] == [1, 2, 3]
