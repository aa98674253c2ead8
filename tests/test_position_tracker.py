"""Follow-through tracker tests: signal classification priority
(position_tracker.py:113-130), containment matching (…:100-111),
best-sentence selection (…:168-186), and Spark-vs-kernel differential."""

from __future__ import annotations

from neuronews_spark.operators.position_tracker import (
    actor_mentioned_py,
    classify_sentence_py,
    followthrough,
    followthrough_py,
    split_sentences_py,
)


def test_classification_priority():
    assert classify_sentence_py("she walked back the pledge") == ("reversed", 0.80)
    assert classify_sentence_py("he doubled down on the plan") == ("reaffirmed", 0.75)
    # mixed signals → updated at 0.50
    assert classify_sentence_py("he reversed course but reaffirmed the goal") == (
        "updated",
        0.50,
    )
    assert classify_sentence_py("the plan was adjusted slightly") == ("updated", 0.65)
    assert classify_sentence_py("nothing relevant here") == ("no_signal", 0.30)


def test_actor_mentioned_substring_semantics():
    # ≥4-char words only; substring (not token) containment
    assert actor_mentioned_py("hartford votes today", "Omar Hart")  # 'hart' ⊂ hartford
    assert not actor_mentioned_py("omaha votes today", "Omar Hart")
    # all words <4 chars → whole-name fallback
    assert actor_mentioned_py("per j li the vote", "J Li")
    assert not actor_mentioned_py("per jli the vote", "J Li")


def test_sentence_split_and_min_len():
    text = "First sentence is long enough. short\n\nA second block over twenty chars"
    parts = split_sentences_py(text)
    assert parts == [
        "First sentence is long enough.",
        "A second block over twenty chars",
    ]


def test_followthrough_best_sentence_and_fallback():
    # two signal sentences: strictly higher conf wins; ties → earlier
    content = (
        "Novak adjusted the budget rule this quarter\n\n"
        "Novak walked back the budget pledge entirely"
    )
    uid, utype, evidence, conf = followthrough_py("p1", "Novak", "economy", "a1", content)
    assert utype == "reversed" and conf == 0.80 and "walked back" in evidence
    # actor+topic mentioned but no signals → no_signal with content snippet
    content2 = "Novak discussed the budget with reporters at length today"
    r = followthrough_py("p1", "Novak", "economy", "a2", content2)
    assert r[1] == "no_signal" and r[3] == 0.30 and r[2] == content2[:200]
    # topic not mentioned → no record at all
    assert followthrough_py("p1", "Novak", "healthcare", "a3", content2) is None


def test_spark_matches_kernel(spark):
    positions = spark.createDataFrame(
        [
            ("p1", "Novak", "economy"),
            ("p2", "Jane Doe", "environment"),
            ("p3", "The board", "technology"),
        ],
        "position_id string, actor string, topic string",
    )
    arts = [
        ("a1", "Novak reversed the budget pledge\n\nmarkets watched the tax plan"),
        ("a2", "Jane Doe reaffirmed the solar plan. The energy goal stands firm"),
        ("a3", "the board paused the data rollout\n\nNovak also discussed the budget"),
        ("a4", "no actors or topics in this one at all"),
        ("a5", ""),
    ]
    articles = spark.createDataFrame(arts, "article_id string, content string")
    got = {
        (r["position_id"], r["article_id"]): (
            r["update_id"],
            r["update_type"],
            r["evidence_text"],
            r["confidence"],
        )
        for r in followthrough(positions, articles).collect()
    }
    expected = {}
    for pid, actor, topic in [
        ("p1", "Novak", "economy"),
        ("p2", "Jane Doe", "environment"),
        ("p3", "The board", "technology"),
    ]:
        for aid, content in arts:
            res = followthrough_py(pid, actor, topic, aid, content)
            if res:
                expected[(pid, aid)] = res
    assert got == expected and len(expected) >= 3
    # the lookbehind sentence split (Java-only half) is exercised by a2
    assert got[("p2", "a2")][1] == "reaffirmed"
