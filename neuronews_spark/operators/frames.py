"""Per-document frame classification (7-frame keyword-density heuristic).

Clean-room re-expression of the reference's frame classifier fallback
(``/root/reference/src/argument_mining/frames.py:48-127``) — the path it
takes when no trained model exists (the distilbert checkpoint is absent
here just as it is in a fresh reference install):

  score(frame)  = min(0.90, 0.15 + 0.20 · |words ∩ keywords(frame)|)
                  for the six specific frames
  score(other)  = 0.70 when no specific frame reaches 0.25, else 0.12
  dominant      = argmax, ties to the earlier frame in FRAME_LABELS
                  order (Python dict-iteration semantics made explicit)

Pure Column math: one regexp token-set, one array_intersect per frame —
scan-bound, no shuffle, mirrored in DuckDB by the ``doc_frames`` driver
oracle.  This is the operator that would fill the reference's
``document_frames`` table feeding outlet clustering and transparency
scoring (their sandbox analogs currently use a compatible keyword-ratio
lexicon; this one matches the reference's exact step function).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FRAME_LABELS = ["economic", "security", "humanitarian", "legal",
                "political", "scientific", "other"]

# frames.py:48-101 (verbatim keyword sets — the rule specification)
FRAME_KEYWORDS: dict[str, list[str]] = {
    "economic": [
        "market", "markets", "revenue", "profit", "gdp", "trade", "budget",
        "tax", "tariff", "investment", "inflation", "unemployment", "debt",
        "fiscal", "monetary", "economic", "financial", "economy", "bank",
        "banking", "export", "import", "spending", "recession", "growth",
        "price", "prices", "wage", "wages", "cost", "costs", "stock", "bond",
        "treasury", "currency", "rate", "rates", "subsidy", "earnings",
        "surplus", "deficit",
    ],
    "security": [
        "military", "weapon", "army", "navy", "attack", "threat", "war",
        "soldier", "combat", "defence", "defense", "intelligence", "terrorism",
        "nuclear", "missile", "border", "crime", "violence", "troops", "force",
        "armed", "police", "surveillance", "cybersecurity", "breach", "raid",
        "hostage", "extremism", "espionage", "deterrence", "arsenal",
        "battalion",
    ],
    "humanitarian": [
        "refugee", "poverty", "hunger", "humanitarian", "aid", "rights",
        "displacement", "victim", "civilian", "relief", "shelter", "suffering",
        "vulnerable", "child", "food", "water", "emergency", "evacuation",
        "displaced", "dignity", "trauma", "famine", "charity", "orphan",
        "sanitation", "malnutrition", "asylum", "stateless", "persecution",
    ],
    "legal": [
        "court", "lawsuit", "law", "regulation", "legislation", "ruling",
        "judge", "attorney", "compliance", "statute", "contract", "liability",
        "enforcement", "prosecution", "verdict", "constitutional",
        "jurisdiction", "treaty", "amendment", "plaintiff", "defendant",
        "penalty", "sentence", "litigation", "appeal", "legal", "injunction",
        "subpoena", "indictment",
    ],
    "political": [
        "election", "government", "parliament", "senate", "party", "vote",
        "president", "minister", "diplomacy", "coalition", "opposition",
        "administration", "democracy", "congress", "governor", "cabinet",
        "political", "campaign", "ballot", "reform", "diplomat", "ambassador",
        "referendum", "sanctions", "geopolitical", "partisan", "constituency",
    ],
    "scientific": [
        "research", "study", "data", "experiment", "findings", "analysis",
        "evidence", "hypothesis", "methodology", "trial", "laboratory",
        "publication", "statistics", "model", "theory", "discovery",
        "innovation", "algorithm", "simulation", "sample", "cohort",
        "clinical", "measurement", "peer", "journal", "dataset", "scientific",
        "correlation", "regression", "genome", "protein", "neural", "quantum",
    ],
}

BASE, STEP, CAP = 0.15, 0.20, 0.90  # frames.py:114
OTHER_HIGH, OTHER_LOW, OTHER_GATE = 0.70, 0.12, 0.25  # frames.py:118


def _word_set(text: Column) -> Column:
    return F.array_distinct(F.regexp_extract_all(F.lower(text), F.lit(r"\w+"), 0))


def frame_scores(text: Column) -> list[Column]:
    """The 7 frame-score Columns in FRAME_LABELS order (frames.py:103-120)."""
    words = _word_set(text)
    specific = [
        F.least(
            F.lit(CAP),
            F.lit(BASE)
            + F.size(
                F.array_intersect(words, F.array(*[F.lit(k) for k in kws]))
            )
            * STEP,
        )
        for kws in FRAME_KEYWORDS.values()
    ]
    top = F.greatest(*specific)
    other = F.when(top < OTHER_GATE, F.lit(OTHER_HIGH)).otherwise(F.lit(OTHER_LOW))
    return specific + [other]


def classify_frames(
    df: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, f_<frame> × 7, dominant): the reference's per-doc
    FramePrediction row.  dominant = argmax with ties to the earlier
    label — the Python dict-iteration tiebreak made explicit via a
    (score, -idx) struct max."""
    scores = frame_scores(F.col(text_col))
    named = [s.alias(f"f_{lbl}") for s, lbl in zip(scores, FRAME_LABELS)]
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"f_{lbl}").alias("score"),
                    F.lit(-i).alias("neg_idx"),
                    F.lit(lbl).alias("label"),
                )
                for i, lbl in enumerate(FRAME_LABELS)
            ]
        )
    )
    return df.select(F.col(doc_col).alias("doc_id"), *named).withColumn(
        "dominant", best["label"]
    )


CONCENTRATED_THRESHOLD = 0.60  # argument_routes.py _CONCENTRATED_THRESHOLD


def frames_by_source(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Frame distribution per publication source
    (argument_routes.py:1006-1127): avg score per frame (round 4),
    doc_count, dominant frame, and the editorial-concentration flag
    (any avg strictly above 0.60 → concentrated_frame = dominant).

    Determinism pivot: the reference's dominant tiebreak inherits dict
    fill order from an unordered SQL result; here ties go to the earlier
    FRAME_LABELS entry, matching classify_frames.  One groupBy on the
    source key — partial aggregation map-side, no per-source queries."""
    scores = frame_scores(F.col(text_col))
    per_doc = df.select(
        F.col(source_col).alias("source"),
        *[s.alias(f"f_{lbl}") for s, lbl in zip(scores, FRAME_LABELS)],
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("doc_count"),
        *[F.round(F.avg(f"f_{lbl}"), 4).alias(f"avg_{lbl}") for lbl in FRAME_LABELS],
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"avg_{lbl}").alias("score"),
                    F.lit(-i).alias("neg_idx"),
                    F.lit(lbl).alias("label"),
                )
                for i, lbl in enumerate(FRAME_LABELS)
            ]
        )
    )
    return agg.select(
        "source",
        *[f"avg_{lbl}" for lbl in FRAME_LABELS],
        "doc_count",
        best["label"].alias("dominant"),
        (best["score"] > CONCENTRATED_THRESHOLD).alias("concentrated"),
        F.when(best["score"] > CONCENTRATED_THRESHOLD, best["label"]).alias(
            "concentrated_frame"
        ),
    )


# ----------------------------------------------------------------------
# Python kernel mirror (differential tests only)
# ----------------------------------------------------------------------


def frame_heuristic_py(text: str) -> tuple[dict[str, float], str]:
    """frames.py:103-127 faithful mirror."""
    words = set(re.findall(r"\b\w+\b", text.lower()))
    scores: dict[str, float] = {}
    for frame, keywords in FRAME_KEYWORDS.items():
        matches = len(words & set(keywords))
        scores[frame] = min(CAP, BASE + matches * STEP)
    top_specific = max(scores.values()) if scores else 0.0
    scores["other"] = OTHER_HIGH if top_specific < OTHER_GATE else OTHER_LOW
    dominant = max(scores, key=scores.__getitem__)
    return scores, dominant
