"""Differential tests for lm_cross_entropy (CCNet-style quality
tiers) and importance_sample (hash-acceptance weighted sampling)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from neuronews_spark.operators.importance import (
    importance_sample,
    lm_cross_entropy,
)

TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the the the the the", "en"),
    (3, "zzz qqq xxx vvv", "xx"),
    (4, "quick quick fox fox", "en"),
    (5, "der schnelle braune fuchs", "de"),
    (6, "", "en"),
]


def _python_costs():
    toks = {i: t.lower().split() for i, t, _ in TEXTS}
    pool = [w for ws in toks.values() for w in ws]
    target = [
        w for (i, t, lang) in TEXTS for w in t.lower().split() if lang == "en"
    ]
    t_c = Counter(target)
    vocab = set(pool)
    T, V = len(target), len(vocab)
    c_q = {
        w: round(1e6 * (math.log(T + V) - math.log(t_c.get(w, 0) + 1)))
        for w in vocab
    }
    return {
        i: (len(ws), sum(c_q[w] for w in ws))
        for i, ws in toks.items()
        if ws
    }


def test_lm_cross_entropy_matches_python(spark):
    docs = spark.createDataFrame(TEXTS, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["cost_micro_nats"])
        for r in lm_cross_entropy(docs, F.col("lang") == "en").collect()
    }
    assert got == _python_costs()


def test_lm_cross_entropy_buckets(spark):
    docs = spark.createDataFrame(TEXTS, ["doc_id", "text", "lang"])
    exp = _python_costs()
    cuts = sorted(s / n for n, s in exp.values())
    head, tail = cuts[1] + 1, cuts[-2] - 1  # force all three buckets
    rows = lm_cross_entropy(
        docs, F.col("lang") == "en", head_cutoff=head, tail_cutoff=tail
    ).collect()
    got = {r["doc_id"]: r["ppl_bucket"] for r in rows}
    for i, (n, s) in exp.items():
        mean = s / n
        want = "head" if mean < head else ("tail" if mean > tail else "middle")
        assert got[i] == want
    assert {"head", "middle", "tail"} == set(got.values())
    # doc 2 is pure target stopword mass -> cheapest; doc 3 is pure OOV
    assert got[2] == "head" and got[3] == "tail"


def test_lm_cross_entropy_one_sided_cutoffs(spark):
    """A single cutoff is legal: the missing side's rows land in
    'middle' (previously crashed with TypeError(float(None)))."""
    docs = spark.createDataFrame(TEXTS, ["doc_id", "text", "lang"])
    exp = _python_costs()
    cuts = sorted(s / n for n, s in exp.values())
    head, tail = cuts[1] + 1, cuts[-2] - 1

    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm_cross_entropy(
            docs, F.col("lang") == "en", head_cutoff=head
        ).collect()
    }
    for i, (n, s) in exp.items():
        assert got[i] == ("head" if s / n < head else "middle")

    got = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm_cross_entropy(
            docs, F.col("lang") == "en", tail_cutoff=tail
        ).collect()
    }
    for i, (n, s) in exp.items():
        assert got[i] == ("tail" if s / n > tail else "middle")


def _u(seed: int, doc_id) -> float:
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_importance_sample_matches_hash_rule(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = {r["doc_id"] for r in importance_sample(df, "w", seed=7).collect()}
    mx = max(w for _, w in rows)
    expect = {i for i, w in rows if _u(7, i) < w / mx}
    assert kept == expect
    assert 0 < len(kept) < len(rows)


def test_importance_sample_acceptance_proportional_to_weight(spark):
    # weight 10 rows should be kept ~10x more often than weight 1 rows
    rows = [(i, 1 if i % 2 else 10) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = importance_sample(df, "w", seed=3).groupBy("w").count().collect()
    by_w = {r["w"]: r["count"] for r in kept}
    assert by_w[10] == 1000  # w == max -> always kept
    assert 50 <= by_w[1] <= 150  # ~10% of 1000

def test_importance_sample_emits_exact_draw_and_keeps_schema(spark):
    df = spark.createDataFrame([(5, 2.0), (6, 4.0)], ["doc_id", "w"])
    out = importance_sample(df, "w", seed=17)
    assert out.columns == ["doc_id", "w", "draw"]
    for r in out.collect():
        assert r["draw"] == _u(17, r["doc_id"])


def test_vocab_kl_drift_matches_python(spark):
    from neuronews_spark.operators.importance import vocab_kl_drift

    rows = [
        (1, "aa aa bb", True),
        (2, "aa cc", True),
        (3, "bb bb bb dd", False),
        (4, "aa dd dd", False),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "base"])
    base = [w for _, t, b in rows if b for w in t.split()]
    rest = [w for _, t, b in rows if not b for w in t.split()]
    a_c, b_c = Counter(base), Counter(rest)
    vocab = sorted(set(base) | set(rest))
    A, B, V = len(base), len(rest), len(vocab)
    exp = {}
    for w in vocab:
        p = (a_c.get(w, 0) + 1) / (A + V)
        q = (b_c.get(w, 0) + 1) / (B + V)
        exp[w] = (
            a_c.get(w, 0),
            b_c.get(w, 0),
            round(1e12 * p * (math.log(p) - math.log(q))),
        )
    got = [
        (r["tok"], r["a_c"], r["b_c"], r["kl_contrib_pico"])
        for r in vocab_kl_drift(
            docs, F.col("base"), top_k=10
        ).collect()
    ]
    want = sorted(
        ((w, *exp[w]) for w in vocab),
        key=lambda t: (-abs(t[3]), t[0]),
    )
    assert got == want
    # Gibbs: total KL over the full vocab is non-negative
    assert sum(v[2] for v in exp.values()) >= 0
