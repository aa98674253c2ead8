"""Third parity batch: the reference's drift-detector and evidence unit
tests against this engine's operators (same inputs, same expected
outcomes).

Sources: test_drift_detector.py:45-98, test_evidence.py:76-92.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neuronews_spark.operators.evidence import contradiction_score, stance_drift

WSCHEMA = (
    "source string, topic string, window_start string, stance string, "
    "document_count long, confidence double"
)


def _drift(spark, rows):
    return stance_drift(spark.createDataFrame(rows, WSCHEMA)).collect()


def test_no_events_for_empty_or_single_window(spark):
    assert _drift(spark, []) == []
    assert _drift(spark, [("s", "t", "2026-06-01", "supportive", 5, 0.7)]) == []


def test_no_event_same_stance_small_delta(spark):
    rows = [
        ("s", "t", "2026-06-01", "supportive", 5, 0.70),
        ("s", "t", "2026-06-08", "supportive", 5, 0.75),
    ]
    assert _drift(spark, rows) == []


def test_event_when_dominant_stance_changes(spark):
    rows = [
        ("s", "t", "2026-06-01", "supportive", 10, 0.80),
        ("s", "t", "2026-06-01", "critical", 1, 0.75),
        ("s", "t", "2026-06-08", "critical", 10, 0.80),
        ("s", "t", "2026-06-08", "supportive", 1, 0.75),
    ]
    ev = _drift(spark, rows)
    assert len(ev) == 1
    assert ev[0]["from_stance"] == "supportive" and ev[0]["to_stance"] == "critical"


def test_event_when_confidence_delta_exceeds_threshold(spark):
    rows = [
        ("s", "t", "2026-06-01", "supportive", 5, 0.90),
        ("s", "t", "2026-06-08", "supportive", 5, 0.60),
    ]
    ev = _drift(spark, rows)
    assert len(ev) == 1
    assert ev[0]["from_stance"] == ev[0]["to_stance"] == "supportive"
    assert abs(ev[0]["confidence_delta"] - 0.30) < 1e-9


def test_contradiction_score_reference_cases(spark):
    # test_evidence.py:76-92 — clean sentence scores 0 signals, negation
    # and hedge words raise the count
    df = spark.createDataFrame(
        [
            ("the results were published in the journal",),
            ("however the claim is not true and was disputed",),
            ("critics deny this and dispute the premise",),
        ],
        "sentence string",
    )
    scores = [
        r["c"]
        for r in df.select(
            contradiction_score(F.col("sentence")).alias("c")
        ).collect()
    ]
    assert scores[0] == 0
    assert scores[1] >= 2 and scores[2] >= 2
