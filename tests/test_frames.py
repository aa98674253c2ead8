"""Frame-classifier tests: reference heuristic cases (frames.py:103-127,
test_frames.py:42-81 with FRAME_THRESHOLD=0.25) + Spark differential."""

from __future__ import annotations

from pyspark.sql import functions as F

from neuronews_spark.operators.frames import (
    FRAME_LABELS,
    classify_frames,
    frame_heuristic_py,
)

FRAME_THRESHOLD = 0.25


def test_reference_frame_cases():
    cases = {
        "Markets fell sharply as inflation rose 4.1% and the central bank"
        " raised rates.": "economic",
        "Military forces launched an attack on enemy infrastructure near"
        " the border.": "security",
        "Aid agencies warned that displaced refugees face acute food and"
        " water insecurity.": "humanitarian",
        "The court issued a ruling upholding the regulation; the"
        " plaintiff's appeal was dismissed.": "legal",
        "The election result left the coalition without a majority in"
        " parliament.": "political",
        "The peer-reviewed study found a statistically significant"
        " correlation in the clinical trial data.": "scientific",
    }
    for text, frame in cases.items():
        scores, _ = frame_heuristic_py(text)
        assert scores[frame] > FRAME_THRESHOLD, (text, scores)
    # no specific signals → other scores 0.70 and dominates
    scores, dom = frame_heuristic_py(
        "The festival drew thousands of visitors over the weekend."
    )
    assert scores["other"] == 0.70 and dom == "other"


def test_step_function_and_cap():
    # 0 matches → 0.15 floor; cap at 0.90 regardless of match count
    scores, _ = frame_heuristic_py("xyzzy")
    assert all(scores[f] == 0.15 for f in FRAME_LABELS[:-1])
    many = " ".join(["market", "revenue", "profit", "tax", "trade", "budget"])
    scores, _ = frame_heuristic_py(many)
    assert scores["economic"] == 0.90
    # distinct words: repeats don't raise the count
    scores2, _ = frame_heuristic_py("tax tax tax")
    assert scores2["economic"] == frame_heuristic_py("tax")[0]["economic"]


def test_dominant_tiebreak_is_label_order():
    # economic and security both at one match → economic (earlier label)
    _, dom = frame_heuristic_py("the tax attack debate")
    assert dom == "economic"


def test_spark_matches_kernel(spark):
    texts = [
        "Markets fell as inflation rose and the bank raised rates",
        "the army attack at the border",
        "refugee aid shelter",
        "court ruling lawsuit",
        "election parliament coalition",
        "study data clinical correlation",
        "festival art music",
        "",
        "the tax attack debate",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: tuple(r[f"f_{l}"] for l in FRAME_LABELS) + (r["dominant"],)
        for r in classify_frames(df).collect()
    }
    for i, t in enumerate(texts):
        scores, dom = frame_heuristic_py(t)
        assert got[i] == tuple(scores[l] for l in FRAME_LABELS) + (dom,), t


def test_frames_by_source_concentration(spark):
    """argument_routes.py:1006-1127: per-source frame averages, dominant
    tiebreak, strict >0.60 concentration gate."""
    from neuronews_spark.operators.frames import frames_by_source

    docs = spark.createDataFrame(
        [
            ("A", "market revenue profit tax"),     # economic capped 0.90
            ("A", "market revenue tax"),            # economic 0.75
            ("B", "market nothing"),                # economic 0.35
            ("B", "plain words"),                   # all 0.15 -> other 0.70
            ("C", "court ruling lawsuit"),          # legal 0.75
            ("C", "plain words"),                   # other 0.70
        ],
        "source string, text string",
    )
    out = {r["source"]: r.asDict() for r in frames_by_source(docs).collect()}
    a = out["A"]
    assert a["avg_economic"] == round((0.90 + 0.75) / 2, 4)
    assert a["dominant"] == "economic" and a["concentrated"]
    assert a["concentrated_frame"] == "economic" and a["doc_count"] == 2
    b = out["B"]
    # avgs: economic (0.35+0.15)/2=0.25, other (0.12+0.70)/2=0.41 -> other
    # dominates but 0.41 is NOT > 0.60 -> not concentrated
    assert b["dominant"] == "other" and not b["concentrated"]
    assert b["concentrated_frame"] is None
    c = out["C"]
    # legal 0.45 vs other 0.41 -> legal dominates, below the gate
    assert c["dominant"] == "legal" and not c["concentrated"]
