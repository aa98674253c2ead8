"""Conversation assembly: window-ordered concat with per-turn text equality
(the BASELINE.json row invariant; reference media/models.py:82-83)."""

from __future__ import annotations

from datetime import datetime

from neuronews_spark.operators.conversations import assemble_conversations


def _ts(i: int) -> datetime:
    return datetime(2026, 1, 1, 0, 0, i)


def test_ordered_concat_out_of_order_input(spark):
    rows = [
        # deliberately shuffled turn order in the input
        ("c1", 2, "assistant", "gamma", None, _ts(2)),
        ("c1", 0, "user", "alpha", None, _ts(0)),
        ("c1", 1, "assistant", "beta", None, _ts(1)),
        ("c2", 0, "user", "solo", "search", _ts(5)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["conv_id"]: r for r in assemble_conversations(df).collect()}
    assert got["c1"]["doc_text"] == "alpha beta gamma"
    assert got["c1"]["n_turns"] == 3
    assert got["c1"]["started_at"] == _ts(0)
    assert got["c1"]["ended_at"] == _ts(2)
    assert got["c2"]["doc_text"] == "solo"


def test_per_turn_text_equality_roundtrip(spark):
    # single-word turns: splitting the assembled text must reproduce the
    # original turn sequence exactly (no trim, no reorder, no loss)
    turns = [f"w{i:03d}" for i in range(50)]
    rows = [("c", i, "user", t, None, _ts(i % 60)) for i, t in enumerate(turns)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    doc = assemble_conversations(df).collect()[0]["doc_text"]
    assert doc.split(" ") == turns


def test_null_and_empty_turn_text_preserved(spark):
    rows = [
        ("c", 0, "user", "a", None, _ts(0)),
        ("c", 1, "user", None, None, _ts(1)),
        ("c", 2, "user", "b", None, _ts(2)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    doc = assemble_conversations(df).collect()[0]["doc_text"]
    # " ".join with an empty middle element → double space (reference joins
    # raw segment text verbatim)
    assert doc == "a  b"


def test_max_turns_cap(spark):
    rows = [("c", i, "user", f"t{i}", None, _ts(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = assemble_conversations(df, max_turns=3).collect()[0]
    assert got["doc_text"] == "t0 t1 t2"
    assert got["n_turns"] == 10  # cap is auditable, count is not reduced


def test_conversation_stats_hand_case(spark):
    from datetime import datetime

    from neuronews_spark.operators.conversations import conversation_stats

    rows = [
        # conv A: user, assistant, tool, assistant — 3 switches, 1 tool
        ("A", 0, "user", "hi there", None, datetime(2024, 1, 1, 0, 0, 0)),
        ("A", 1, "assistant", "hello", None, datetime(2024, 1, 1, 0, 0, 5)),
        ("A", 2, "tool", "result", "search", datetime(2024, 1, 1, 0, 0, 9)),
        ("A", 3, "assistant", "done", None, datetime(2024, 1, 1, 0, 1, 0)),
        # conv B: two user turns, no switch, no tools, zero duration
        ("B", 0, "user", "a", None, datetime(2024, 1, 2, 0, 0, 0)),
        ("B", 1, "user", None, None, datetime(2024, 1, 2, 0, 0, 0)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["conv_id"]: r.asDict() for r in conversation_stats(t).collect()}
    a, b = got["A"], got["B"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"], a["n_tool"]) == (4, 1, 2, 1)
    assert a["n_role_switches"] == 3
    assert a["total_chars"] == len("hi there") + len("hello") + len("result") + len("done")
    assert a["duration_s"] == 60
    assert a["tools_used"] == "search"
    assert (b["n_turns"], b["n_user"], b["n_role_switches"]) == (2, 2, 0)
    assert b["total_chars"] == 1  # null text counts as ''
    assert b["duration_s"] == 0
    assert b["tools_used"] == ""
