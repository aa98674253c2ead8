"""Attribution classifier + outlet transparency scorer tests.

Differential: the Column regexp chain in
neuronews_spark/operators/attribution.py vs the reference-faithful
Python kernel (attribution.py:93-178 semantics) over every
(template, source_type) combination plus adversarial edge cases.
Scorer: hand-built frames with known entropies (outlet_scorer.py:81-91)
and the missing-data defaults (…:147-150,162-164).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neuronews_spark.operators.attribution import (
    classify_attribution,
    classify_attribution_py,
    with_attribution,
)

TYPES = ["news", "paper", "transcript", "blog", "note", "web", "book"]

TEXTS = [
    "according to Jane Doe, the metric improved",
    "results hold (Smith, 2023) in recent trials",
    "Alice Smith: the cache layer is stable",
    "I found the index regressed badly",
    "clearly, according to Bob Lee, the answer is known",
    "Dr Lee said the rollout was delayed",
    "the team said it shipped early",
    "officials say the fix works",
    "latency dropped per vendor filings, on review",
    "as shown in [12, 13] the loss fell",
    # edge cases beyond the driver templates
    "",
    "plain text with no attribution at all",
    "Jones et al. argue this; see (Jones et al., 2021; Kim, 2020)",
    "Maria Lopez Garcia: we measured the throughput",
    "she said that the deadline moved",  # tattr + news-said
    "They told reporters nothing",  # bare pronoun: opener rule needs a space
    "in my experience the cache wins",
    "obviously according to experts, it works",  # opinion + attribution
    "per the spec",  # 'per' group then end-of-string
    "see [" + "1, " * 60 + "2]",  # clip path (>120-char numeric citation)
]


def test_kernel_reference_cases():
    """Spot-assert the reference's documented rule outcomes
    (attribution.py:7-17,93-142)."""
    assert classify_attribution_py(TEXTS[0], "news") == (True, "Jane Doe")
    assert classify_attribution_py(TEXTS[1], "paper") == (True, "(Smith, 2023)")
    assert classify_attribution_py(TEXTS[2], "transcript") == (True, "Alice Smith")
    assert classify_attribution_py(TEXTS[3], "blog") == (True, "I found")
    # blog: opinion-as-fact short-circuits BEFORE the news fallback...
    assert classify_attribution_py(TEXTS[4], "blog") == (False, None)
    # ...but transcript falls through to news and attributes
    assert classify_attribution_py(TEXTS[4], "transcript") == (True, "Bob Lee")
    assert classify_attribution_py(TEXTS[5], "news") == (True, "Dr Lee")
    # common-opener rejection needs the trailing space — "the team" is
    # rejected but a bare pronoun snippet like "They" is kept
    assert classify_attribution_py(TEXTS[6], "news") == (False, None)
    assert classify_attribution_py(TEXTS[15], "news") == (True, "They")
    assert classify_attribution_py(TEXTS[7], "web") == (True, "officials")
    assert classify_attribution_py(TEXTS[8], "news") == (True, "vendor filings")
    assert classify_attribution_py(TEXTS[9], "book") == (True, "[12, 13]")
    assert classify_attribution_py("", "news") == (False, None)
    assert classify_attribution_py(TEXTS[16], "note") == (
        True,
        "in my experience",
    )
    # clip: snippet capped at 120 chars with ellipsis (paper numeric
    # citation is the only uncapped capture group)
    attributed, snip = classify_attribution_py(TEXTS[19], "paper")
    assert attributed and len(snip) == 118 and snip.endswith("…")


def test_spark_matches_python_kernel(spark):
    rows = [
        (i * len(TYPES) + j, t, st)
        for i, t in enumerate(TEXTS)
        for j, st in enumerate(TYPES)
    ]
    df = spark.createDataFrame(rows, "id long, claim_text string, source_type string")
    got = {
        r["id"]: (r["attributed"], r["attribution_text"])
        for r in with_attribution(df).collect()
    }
    for rid, text, st in rows:
        assert got[rid] == classify_attribution_py(text, st), (
            f"mismatch for {st!r}: {text!r}"
        )


def test_unknown_type_uses_news_rules(spark):
    df = spark.createDataFrame(
        [(TEXTS[0], "mystery")], "claim_text string, source_type string"
    )
    row = df.select(
        classify_attribution(F.col("claim_text"), F.col("source_type")).alias("a")
    ).collect()[0]["a"]
    assert row["attributed"] and row["attribution_text"] == "Jane Doe"


# ---------------------------------------------------------------- scorer


def test_outlet_scores_composite_and_defaults(spark):
    from neuronews_spark.operators.outlet_scorer import outlet_scores

    # 4 docs for outlet A (mixed frames), 3 for B (single frame), 2 for C
    # (dropped by min_docs).  Keywords from DEFAULT_FRAME_KEYWORDS:
    # 'value'=economic, 'hash'=security.
    docs = spark.createDataFrame(
        [
            ("A", "value hash"),
            ("A", "value hash"),
            ("A", "value hash"),
            ("A", "value hash"),
            ("B", "value value"),
            ("B", "value value"),
            ("B", "value value"),
            ("C", "value"),
            ("C", "hash"),
        ],
        "source string, text string",
    )
    # A: 2 of 3 claims attributed; B: no claims at all
    claims = spark.createDataFrame(
        [("A", True), ("A", True), ("A", False)], "source string, attributed boolean"
    )
    # A: balanced 4-stance split (entropy 1.0); B: no stance data (0.5)
    stanced = spark.createDataFrame(
        [("A", "supportive"), ("A", "critical"), ("A", "neutral"), ("A", "ambiguous")],
        "source string, stance string",
    )
    out = {r["source"]: r.asDict() for r in outlet_scores(docs, claims, stanced).collect()}
    assert set(out) == {"A", "B"}  # C dropped: doc_count < 3

    a = out["A"]
    # frames for A: economic=0.5, security=0.5, other=0 → entropy ln2/ln7
    assert a["frame_diversity"] == round(math.log(2) / math.log(7), 4)
    assert a["attribution_rate"] == round(2 / 3, 4)
    assert a["stance_neutrality"] == 1.0
    assert a["doc_count"] == 4 and a["claim_count"] == 3
    assert a["composite_score"] == round(
        (a["frame_diversity"] + a["attribution_rate"] + a["stance_neutrality"]) / 3, 4
    )

    b = out["B"]
    # all mass on one frame → entropy 0; no claims → rate 0, count 0;
    # no stance rows → neutrality midpoint 0.5 (outlet_scorer.py:162-164)
    assert b["frame_diversity"] == 0.0
    assert b["attribution_rate"] == 0.0 and b["claim_count"] == 0
    assert b["stance_neutrality"] == 0.5
    assert b["composite_score"] == round(0.5 / 3, 4)
