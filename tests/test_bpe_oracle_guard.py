"""Corpus guard for the BPE DuckDB oracles.

``_bpe_token_counts_sql`` reads per-word token counts off the unrolled
training chain's FINAL state, while the Spark side (tokenizer.
bpe_encode) re-encodes each word rank-greedily against the learned
merge table.  The two agree whenever rank-greedy encoding of a
training-corpus word reproduces the trainer's final segmentation —
true unless a later merge manufactures a symbol string identical to an
earlier merge's output in a position the training pass never saw (the
classic BPE encode/train divergence).  This guard replays BOTH kernels
in pure Python over the ACTUAL corpus vocabulary at sf0.001 and sf0.01
and asserts per-word equality, so a corpus change that opens the
divergence fails here instead of flaking the driver's hash compare.

The sequential trainer replayed here is the same reference algorithm
differentially pinned against Spark's bpe_train in test_tokenizer.py.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
N_MERGES = 12
EOW = "</w>"


def _vocab(sf: str) -> Counter:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT word, count(*) FROM ("
        "  SELECT unnest(list_filter("
        "    string_split_regex(lower(coalesce(text, '')), '\\s+'),"
        "    x -> x <> '')) AS word"
        f"  FROM read_parquet('{sf}/documents.parquet'))"
        "GROUP BY word"
    ).fetchall()
    con.close()
    return Counter(dict(rows))


def _apply(sym: tuple, left: str, right: str) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_chain(vocab: Counter, n: int):
    """Sequential Sennrich trainer over the vocab: returns (merges,
    final per-word symbol state)."""
    state = {w: tuple(list(w) + [EOW]) for w in vocab}
    merges = []
    for _ in range(n):
        counts: Counter = Counter()
        for w, sym in state.items():
            f = vocab[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if freq < 2:
            break
        merges.append((left, right))
        state = {w: _apply(sym, left, right) for w, sym in state.items()}
    return merges, state


def _encode_len(word: str, rank: dict) -> int:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best, best_r = None, None
        for i in range(len(sym) - 1):
            r = rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best, best_r = (sym[i], sym[i + 1]), r
        if best is None:
            break
        sym = list(_apply(tuple(sym), best[0], best[1]))
    return len(sym)


@pytest.mark.parametrize("sf", SFS)
def test_chain_state_equals_rank_greedy_encode(sf):
    vocab = _vocab(sf)
    assert vocab, f"degenerate corpus at {sf}"
    merges, state = _train_chain(vocab, N_MERGES)
    assert len(merges) == N_MERGES, (
        f"early stop at {len(merges)} merges — the 12-step oracle chain "
        f"and this guard no longer cover the same regime at {sf}"
    )
    rank = {pair: i for i, pair in enumerate(merges)}
    diverged = {
        w: (len(state[w]), _encode_len(w, rank))
        for w in vocab
        if len(state[w]) != _encode_len(w, rank)
    }
    assert not diverged, (
        f"encode/train divergence at {sf} (word: chain vs encode): "
        f"{dict(list(diverged.items())[:5])}"
    )
