"""Differential tests: distributed BPE training vs a pure-Python
reference implementation of the same algorithm (Sennrich et al. 2016,
algorithm 1: count pairs over the word-frequency vocab, merge the
argmax, repeat)."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from neuronews_spark.operators.tokenizer import (
    bpe_pair_counts,
    bpe_train,
    word_counts,
)


def _python_bpe(texts: list[str], n_merges: int):
    """Sennrich's algorithm verbatim: vocab of symbol tuples keyed by
    word, greedy left-to-right non-overlapping merge application, total
    tie-break (freq DESC, left ASC, right ASC)."""
    wc = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((step, left, right, cnt))
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference_classic(spark):
    # the classic Sennrich worked example vocabulary
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [tuple(r) for r in bpe_train(docs, 8).collect()]
    assert got == _python_bpe(texts, 8)


def test_bpe_train_matches_python_reference_random_corpus(spark):
    rng = random.Random(41)
    words = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
             for _ in range(60)]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 25)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [tuple(r) for r in bpe_train(docs, 12).collect()]
    assert got == _python_bpe(texts, 12)
    assert len(got) == 12  # corpus is rich enough that no early stop fires


def test_bpe_train_early_stop_when_nothing_repeats(spark):
    # every adjacent pair (incl. char+</w>) occurs exactly once
    docs = spark.createDataFrame([(1, "abc xyz")], ["doc_id", "text"])
    assert bpe_train(docs, 5).count() == 0


def test_bpe_pair_counts_equals_first_python_iteration(spark):
    texts = ["low lower newest widest", "low low newest newest newest"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    wc = Counter(w for t in texts for w in t.lower().split())
    expect: Counter = Counter()
    for w, c in wc.items():
        sym = list(w) + ["</w>"]
        for i in range(len(sym) - 1):
            expect[(sym[i], sym[i + 1])] += c
    got = {
        (r["left"], r["right"]): r["pair_freq"]
        for r in bpe_pair_counts(docs).collect()
    }
    assert got == dict(expect)
    # top-k obeys the training tie-break exactly
    top = [tuple(r) for r in bpe_pair_counts(docs, k=4).collect()]
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:4]
    assert top == [(l, r, c) for (l, r), c in want]


def test_word_counts_ignores_case_and_blank_runs(spark):
    docs = spark.createDataFrame(
        [(1, "Foo  foo\tBAR"), (2, " bar ")], ["doc_id", "text"]
    )
    got = {r["word"]: r["freq"] for r in word_counts(docs).collect()}
    assert got == {"foo": 2, "bar": 2}


def test_merge_application_is_non_overlapping_left_to_right(spark):
    # 'aaaa' + merge (a,a) must yield aa,aa — not aa,a,a or a cascade
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], ["doc_id", "text"]
    )
    merges = [tuple(r) for r in bpe_train(docs, 2).collect()]
    assert merges == _python_bpe(["aaaa aaaa aaaa"], 2)
    assert merges[0][1:3] == ("a", "a")
    # step 2 ties (aa,aa)=3 with (aa,</w>)=3; '<' sorts before 'a'
    assert merges[1][1:3] == ("aa", "</w>")


def _python_encode_len(word: str, rank: dict) -> int:
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best, best_r = None, None
        for i in range(len(sym) - 1):
            r = rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best, best_r = (sym[i], sym[i + 1]), r
        if best is None:
            break
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                out.append(best[0] + best[1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


def test_bpe_encode_matches_python_and_trainer_state(spark):
    from neuronews_spark.operators.tokenizer import bpe_encode, bpe_train

    rng = random.Random(97)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(2, 15)))
             for _ in range(25)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges = bpe_train(docs, 10)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    rank = {
        (r["left"], r["right"]): r["step"] for r in merges.collect()
    }
    for i, t in enumerate(texts):
        ws = t.lower().split()
        assert got[i] == (len(ws), sum(_python_encode_len(w, rank) for w in ws))
    # encode(training corpus) reproduces the trainer's final symbol
    # state: total bpe tokens == Σ |final vocab symbols| · freq
    py_merges = _python_bpe(texts, 10)
    vocab = Counter(w for t in texts for w in t.lower().split())
    sym_state = {tuple(list(w) + ["</w>"]): c for w, c in vocab.items()}
    for _, left, right, _f in py_merges:
        new_state = {}
        for sym, c in sym_state.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + c
        sym_state = new_state
    want_total = sum(len(s) * c for s, c in sym_state.items())
    assert sum(v[1] for v in got.values()) == want_total


def test_symbols_binds_to_passed_column(spark):
    """_symbols must build from the Column it is GIVEN, not a column
    literally named 'word' (previously an F.expr hardcoded the name, so
    any other caller silently bound wrong or failed to resolve)."""
    from neuronews_spark.operators.tokenizer import _symbols

    df = spark.createDataFrame(
        [("abc", "zzzz")], ["token", "word"]
    ).select(_symbols(F.col("token")).alias("sym"))
    assert df.collect()[0]["sym"] == ["a", "b", "c", "</w>"]
