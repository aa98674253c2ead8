"""Bloom-sketch decontamination: guarantees and approximation behavior."""

from __future__ import annotations

from neuronews_spark.operators.dedup import (
    bloom_ngram_decontaminate,
    ngram_decontaminate,
)


def _doc(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_bloom_no_false_negatives_and_exact_at_default_params(spark):
    # t1's span is quoted verbatim inside e1; e2 is clean
    t_rows = [("t1", _doc("alpha", 30)), ("t2", _doc("beta", 30))]
    e_rows = [
        ("e1", _doc("noise", 5) + " " + _doc("alpha", 20)),
        ("e2", _doc("clean", 30)),
    ]
    train = spark.createDataFrame(t_rows, "doc_id string, text string")
    eval_ = spark.createDataFrame(e_rows, "doc_id string, text string")

    exact = {
        r["eval_id"]: r
        for r in ngram_decontaminate(train, eval_, n=13).collect()
    }
    bloom = {
        r["eval_id"]: r
        for r in bloom_ngram_decontaminate(train, eval_, n=13).collect()
    }
    assert exact["e1"]["n_dirty_grams"] > 0
    assert exact["e2"]["n_dirty_grams"] == 0
    for k in exact:
        assert bloom[k]["n_grams"] == exact[k]["n_grams"]
        # no false negatives — hard Bloom guarantee
        assert bloom[k]["n_dirty_grams_bloom"] >= exact[k]["n_dirty_grams"]
        # at default m=2^22, k=5 over ~40 grams, FPR ~ 0 → exactly equal
        assert bloom[k]["n_dirty_grams_bloom"] == exact[k]["n_dirty_grams"]


def test_bloom_is_approximate_with_tiny_filter(spark):
    # 200 distinct train grams × 2 hashes into 256 bits fills ~79% of the
    # filter; 50 disjoint eval grams then false-positive w.p. ~0.63 each —
    # P(zero FPs) < 1e-20, so this pins that the sketch is a real Bloom
    # filter (approximate), not a hidden exact join
    train = spark.createDataFrame(
        [("t1", _doc("w", 212))], "doc_id string, text string"
    )
    eval_ = spark.createDataFrame(
        [("e1", _doc("z", 62))], "doc_id string, text string"
    )
    exact = ngram_decontaminate(train, eval_, n=13).collect()[0]
    assert exact["n_dirty_grams"] == 0
    bloom = bloom_ngram_decontaminate(
        train, eval_, n=13, m_bits=256, k=2
    ).collect()[0]
    assert bloom["n_dirty_grams_bloom"] > 0
