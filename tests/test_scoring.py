"""Differential tests for the batched Jaro-Winkler scale scorer
(functions/simtext.py) against DuckDB's native jaro_winkler_similarity —
the independent engine the er_scale_scored_pairs oracle compares against.

The two published JW conventions differ only in the prefix-boost gate:
Winkler's original (and DuckDB, and most C ports) applies the 0.1·l·(1-j)
boost only when jaro > 0.7; the ungated variant (python-jellyfish pre-1.0)
always applies it.  The kernel exposes boost_threshold to select either;
these tests pin BOTH behaviors so neither can drift silently.
"""

from __future__ import annotations

import random
import string

import duckdb
import numpy as np
import pytest

from neuronews_spark.functions.simtext import _jaro, jaro_winkler_batch


def _duckdb_jw(pairs: list[tuple[str, str]]) -> np.ndarray:
    con = duckdb.connect()
    con.execute("create table p(i integer, a varchar, b varchar)")
    con.executemany(
        "insert into p values (?,?,?)",
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
    )
    out = con.sql(
        "select jaro_winkler_similarity(a,b) from p order by i"
    ).fetchnumpy()
    con.close()
    return next(iter(out.values())).astype(np.float64)


def test_jw_gated_matches_duckdb_on_random_pairs():
    """boost_threshold=0.7 must agree with DuckDB bit-for-bit-ish
    (<1e-12) on ~17k adversarial random pairs, including short strings,
    shared prefixes, and embedded spaces."""
    rng = random.Random(7)
    pairs = []
    for _ in range(20_000):
        a = "".join(
            rng.choices(string.ascii_lowercase + " ", k=rng.randint(1, 12))
        )
        # half the pairs share a prefix with a, to stress the boost path
        if rng.random() < 0.5:
            b = a[: rng.randint(1, len(a))] + "".join(
                rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 8))
            )
        else:
            b = "".join(
                rng.choices(
                    string.ascii_lowercase + " ", k=rng.randint(1, 12)
                )
            )
        if a.strip() and b.strip():
            pairs.append((a, b))
    assert len(pairs) > 17_000
    mine = jaro_winkler_batch(
        np.array([p[0] for p in pairs], dtype=object),
        np.array([p[1] for p in pairs], dtype=object),
        boost_threshold=0.7,
    )
    theirs = _duckdb_jw(pairs)
    assert float(np.max(np.abs(mine - theirs))) < 1e-12


def test_jw_ungated_vs_gated_relationship():
    """The ungated kernel equals the gated one wherever jaro > 0.7, and
    dominates it (adds the boost) on low-jaro shared-prefix pairs."""
    pairs = [
        ("martha", "marhta"),  # jaro ≈ 0.944 — boost applies either way
        ("dixon", "dicksonx"),
        ("ab sfxdlnwrp", "ab kezaaa"),  # jaro ≈ 0.53, shared prefix
        ("xyz", "qrs"),  # no prefix, no matches
    ]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    gated = jaro_winkler_batch(a, b, boost_threshold=0.7)
    ungated = jaro_winkler_batch(a, b)  # default 0.0
    for i, (s1, s2) in enumerate(pairs):
        j = _jaro(s1, s2)
        if j > 0.7:
            assert gated[i] == ungated[i]
        else:
            assert gated[i] == j
            assert ungated[i] >= gated[i]
    # the low-jaro shared-prefix pair is where the conventions truly split
    assert ungated[2] > gated[2]


@pytest.mark.parametrize(
    ("a", "b", "expect"),
    [
        ("martha", "marhta", 0.9611111111111111),  # Winkler's own example
        ("dixon", "dicksonx", 0.8133333333333332),
        ("dwayne", "duane", 0.84),
        ("same", "same", 1.0),
    ],
)
def test_jw_textbook_values(a, b, expect):
    got = jaro_winkler_batch(
        np.array([a], dtype=object),
        np.array([b], dtype=object),
        boost_threshold=0.7,
    )[0]
    assert abs(got - expect) < 1e-12
    # the textbook examples all have jaro > 0.7, so both conventions agree
    assert (
        jaro_winkler_batch(np.array([a], dtype=object), np.array([b], dtype=object))[0]
        == got
    )


def test_jw_empty_string_semantics():
    """Our kernel scores ''≍'' as 1.0 (vacuous identity); DuckDB returns
    0.0 there — the one input class where the engines legitimately
    disagree, which is why the oracled pipeline filters norm <> ''
    before scoring (documented, not accidental)."""
    a = np.array(["", "", "x"], dtype=object)
    b = np.array(["", "x", ""], dtype=object)
    got = jaro_winkler_batch(a, b, boost_threshold=0.7)
    assert got.tolist() == [1.0, 0.0, 0.0]
    assert _duckdb_jw([("", "")])[0] == 0.0
