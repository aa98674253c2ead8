"""Evidence search + stance aggregation tests.

Differential tests of the Spark TF-IDF / cosine path vs the pure-Python
mirror, semantic tests of the reference's post-filters (same-doc
exclusion, per-doc best sentence, top-k cap, contradiction threshold),
and the 4-class stance + drift semantics (argument_routes.py:54-63,
drift_detector.py:29-100).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neuronews_spark.operators.evidence import (
    claim_stances,
    classify_stance,
    cosine_py,
    find_evidence,
    stance_by_source,
    stance_drift,
    tfidf_weights,
    tfidf_weights_py,
)

CORPUS = {
    "a": "the pipeline improves throughput under heavy load",
    "b": "the cache does not improve latency at all",
    "c": "results are wrong and misleading not credible",
    "d": "the pipeline improves throughput",
    "e": "unrelated words about gardening and soil quality",
}


def test_tfidf_weights_matches_python_mirror(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "text_id string, txt string"
    )
    got = {
        (r["text_id"], r["term"]): r["weight"]
        for r in tfidf_weights(df).collect()
    }
    want = tfidf_weights_py(CORPUS)
    want_flat = {(tid, t): w for tid, ws in want.items() for t, w in ws.items()}
    assert set(got) == set(want_flat)
    for k, v in want_flat.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_find_evidence_matches_brute_force(spark):
    claims = spark.createDataFrame(
        [("qc", 0, CORPUS["a"]), ("qd", 0, CORPUS["c"])],
        "doc string, sent_idx int, claim_text string",
    )
    sentences = spark.createDataFrame(
        [(k, 0, v) for k, v in CORPUS.items()],
        "doc string, sent_idx int, sentence string",
    )
    got = {
        (r["claim_doc"], r["ev_doc"]): (r["sim"], r["relation"])
        for r in find_evidence(claims, sentences, threshold=0.05).collect()
    }
    # brute force with the python mirror (one corpus-level fit, like the
    # operator — the per-claim-fit deviation is documented in the module)
    texts = {f"c#{k}": v for k, v in {"qc": CORPUS["a"], "qd": CORPUS["c"]}.items()}
    texts.update({f"s#{k}": v for k, v in CORPUS.items()})
    w = tfidf_weights_py(texts)
    for (cd, ct) in [("qc", "c#qc"), ("qd", "c#qd")]:
        for sd in CORPUS:
            sim = cosine_py(w[ct], w[f"s#{sd}"])
            if sim >= 0.05:
                assert (cd, sd) in got, (cd, sd, sim)
                assert got[(cd, sd)][0] == pytest.approx(round(sim, 6), abs=2e-6)
            else:
                assert (cd, sd) not in got
    # relation: sentence c has signals {wrong, misleading, not} >= 2;
    # claim qd's text IS sentence c's text, so the (qd, c) pair is exact
    assert got[("qd", "c")][1] == "contradicts"
    assert got[("qc", "d")][1] == "supports"


def test_find_evidence_excludes_same_doc_and_caps(spark):
    # claim doc "x" must never match its own sentences (evidence.py:173)
    claims = spark.createDataFrame(
        [("x", 0, "alpha beta gamma")], "doc string, sent_idx int, claim_text string"
    )
    sentences = spark.createDataFrame(
        [("x", 0, "alpha beta gamma"), ("y", 0, "alpha beta gamma")],
        "doc string, sent_idx int, sentence string",
    )
    rows = find_evidence(claims, sentences, threshold=0.1).collect()
    assert [(r["ev_doc"]) for r in rows] == ["y"]

    # per-evidence-doc dedup keeps the best sentence; max_evidence caps docs
    sentences2 = spark.createDataFrame(
        [("y", i, "alpha beta gamma" if i == 3 else "alpha beta") for i in range(5)]
        + [(f"z{i}", 0, "alpha beta gamma") for i in range(15)],
        "doc string, sent_idx int, sentence string",
    )
    rows2 = find_evidence(claims, sentences2, threshold=0.1, max_evidence=10).collect()
    per_doc = {r["ev_doc"]: r for r in rows2}
    assert len(rows2) == len(per_doc) == 10  # capped, one per doc
    if "y" in per_doc:  # y's best sentence is the exact match at idx 3
        assert per_doc["y"]["ev_idx"] == 3


def test_classify_stance_branches(spark):
    rows = spark.createDataFrame(
        [
            # confidence < 0.4 → ambiguous regardless of evidence
            (0.3, 5, 0, "ambiguous"),
            # contradicts > supports and > 0 → critical
            (0.9, 1, 2, "critical"),
            # supports > 0 (con <= sup) → supportive
            (0.9, 2, 2, "supportive"),
            (0.9, 1, 0, "supportive"),
            # no evidence → neutral
            (0.9, 0, 0, "neutral"),
        ],
        "confidence double, sup int, con int, want string",
    )
    got = rows.select(
        "want", classify_stance(F.col("sup"), F.col("con"), F.col("confidence")).alias("got")
    ).collect()
    for r in got:
        assert r["got"] == r["want"]


def test_claim_stances_join_and_source_rollup(spark):
    claims = spark.createDataFrame(
        [(1, 0, 0.9), (2, 0, 0.9), (3, 0, 0.2)],
        "doc long, sent_idx int, confidence double",
    )
    evidence = spark.createDataFrame(
        [(1, 0, 10, 0, 0.5, "supports"), (1, 0, 11, 0, 0.5, "contradicts"),
         (1, 0, 12, 0, 0.5, "contradicts"), (2, 0, 10, 0, 0.5, "supports")],
        "claim_doc long, claim_idx int, ev_doc long, ev_idx int, sim double, relation string",
    )
    st = {r["doc"]: r["stance"] for r in claim_stances(claims, evidence).collect()}
    assert st == {1: "critical", 2: "supportive", 3: "ambiguous"}

    docs = spark.createDataFrame(
        [(1, "srcA", "t1"), (2, "srcA", "t1"), (3, "srcB", "t1")],
        "doc_id long, source string, topic string",
    )
    roll = {
        (r["source"], r["topic"]): r
        for r in stance_by_source(claim_stances(claims, evidence), docs).collect()
    }
    a = roll[("srcA", "t1")]
    assert (a["critical"], a["supportive"], a["total"]) == (1, 1, 2)
    assert roll[("srcB", "t1")]["ambiguous"] == 1


def test_stance_drift_pivots_and_confidence_delta(spark):
    windows = spark.createDataFrame(
        [
            # srcA: dominant flips supportive → critical between w1 and w2
            ("srcA", "t", "2024-01-01", "supportive", 5, 0.8),
            ("srcA", "t", "2024-01-01", "critical", 1, 0.8),
            ("srcA", "t", "2024-01-08", "supportive", 2, 0.8),
            ("srcA", "t", "2024-01-08", "critical", 6, 0.8),
            # srcB: same dominant, small conf delta → NO event
            ("srcB", "t", "2024-01-01", "neutral", 3, 0.5),
            ("srcB", "t", "2024-01-08", "neutral", 3, 0.55),
            # srcC: same dominant but conf delta > 0.2 → event
            ("srcC", "t", "2024-01-01", "neutral", 3, 0.2),
            ("srcC", "t", "2024-01-08", "neutral", 3, 0.7),
        ],
        "source string, topic string, window_start string, stance string, "
        "document_count long, confidence double",
    )
    ev = {r["source"]: r for r in stance_drift(windows).collect()}
    assert set(ev) == {"srcA", "srcC"}
    assert (ev["srcA"]["from_stance"], ev["srcA"]["to_stance"]) == (
        "supportive", "critical",
    )
    assert ev["srcC"]["confidence_delta"] == pytest.approx(0.5)


def test_stance_drift_tie_break_matches_reference_order(spark):
    # drift_detector.py:23 max() breaks count ties by insertion order
    # supportive → critical → neutral → ambiguous
    windows = spark.createDataFrame(
        [
            ("s", "t", "2024-01-01", "critical", 3, 0.5),
            ("s", "t", "2024-01-01", "supportive", 3, 0.5),
            ("s", "t", "2024-01-08", "ambiguous", 2, 0.5),
            ("s", "t", "2024-01-08", "neutral", 2, 0.5),
        ],
        "source string, topic string, window_start string, stance string, "
        "document_count long, confidence double",
    )
    ev = stance_drift(windows).collect()
    assert len(ev) == 1
    assert (ev[0]["from_stance"], ev[0]["to_stance"]) == ("supportive", "neutral")
