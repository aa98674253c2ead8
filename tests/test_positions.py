"""Position-extraction tests: reference rule cases (positions.py:192-296,
models.py:134-166) + Spark-vs-kernel differential."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from neuronews_spark.operators.positions import (
    claim_score_py,
    extract_actor_py,
    extract_positions,
    infer_topic_py,
    position_confidence_py,
    position_id_py,
)

SENTENCES = [
    "ANNA REY: the ministry will adopt the carbon tax rule",
    "Jane Doe: we plan to expand the solar program",
    "President Novak pledged to cut the deficit by 2025",
    "Maria Vega, the finance minister, announced a new wage subsidy",
    "Omar Hart vowed to veto the housing bill",
    "The board committed to review the data privacy policy",
    "The government will raise the defence budget",
    "Could the committee perhaps review the vaccine rollout?",
    "They might consider new rules someday",
    "Results improved after the court ruled on the appeal",
    "Profits rose 3 bn in March 2024, the bank reported",
    "In my view the reform seems premature",
]


def test_claim_heuristic_signals():
    # measurement + dated event + past tense + institution all boost
    # (clamped to 0.95; note the reference's `%\\b` can never fire before
    # a space, so 'bn' is the measurable unit here)
    s = SENTENCES[10]
    assert claim_score_py(s) == 0.95
    # hedging + opinion opener + question penalties
    assert claim_score_py("Could it be so?") < 0.5
    assert claim_score_py(SENTENCES[11]) < 0.5


def test_position_gate():
    # question never position-bearing even with commitment verb
    assert position_confidence_py(SENTENCES[7])[0] is False
    # hedged non-claim without commitment: excluded
    assert position_confidence_py(SENTENCES[8])[0] is False
    # claim without commitment still qualifies (score >= 0.45, is_claim)
    ok, conf = position_confidence_py(SENTENCES[9])
    assert ok and conf == 0.75
    # commitment boost: +0.15 capped at 0.95
    ok, conf = position_confidence_py(SENTENCES[0])
    assert ok and conf == 0.65


def test_actor_patterns_in_priority_order():
    cases = {
        0: "ANNA REY",       # all-caps speaker label
        1: "Jane Doe",       # title-case speaker label
        2: "Novak",          # titled name
        3: "Maria Vega",     # apposition
        4: "Omar Hart",      # name + commitment verb
        5: "The board",      # org subject (case-insensitive)
        6: "The government", # political org subject
    }
    for i, want in cases.items():
        assert extract_actor_py(SENTENCES[i], None, "outlet", "news") == want
    # no pattern → author, then source_id, then source_type
    assert extract_actor_py(SENTENCES[9], "A. Author", "outlet", "news") == "A. Author"
    assert extract_actor_py(SENTENCES[9], None, "outlet", "news") == "outlet"
    assert extract_actor_py(SENTENCES[9], None, None, "news") == "news"


def test_topic_taxonomy_tiebreak():
    # carbon(environment) vs tax(economy): tie → earlier label (economy)
    assert infer_topic_py(SENTENCES[0]) == "economy"
    assert infer_topic_py(SENTENCES[1]) == "environment"
    assert infer_topic_py(SENTENCES[5]) == "technology"
    assert infer_topic_py("nothing topical here") == "general"


def test_position_id_shape():
    pid = position_id_py("42", "Jane Doe", "text")
    assert pid == "pos-" + hashlib.sha1(b"42|Jane Doe|text").hexdigest()[:32]


def test_spark_matches_kernel(spark):
    rows = [
        (i, s, ["news", "transcript", "paper"][i % 3], "src%d" % (i % 3))
        for i, s in enumerate(SENTENCES)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, sentence string, source_type string, source_id string"
    )
    out = extract_positions(
        df, source_id_col="source_id"
    ).collect()
    got = {
        r["document_id"]: (
            r["position_id"],
            r["actor"],
            r["topic"],
            round(r["confidence"], 6),
        )
        for r in out
    }
    expected = {}
    for i, s, st, src in rows:
        is_pos, conf = position_confidence_py(s)
        if not is_pos:
            continue
        actor = extract_actor_py(s, None, src, st)
        expected[i] = (
            position_id_py(str(i), actor, s),
            actor,
            infer_topic_py(s),
            round(conf, 6),
        )
    assert got == expected and len(expected) >= 8
