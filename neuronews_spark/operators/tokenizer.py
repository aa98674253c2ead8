"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The reference tokenizes with pretrained HuggingFace vocabularies
(``src/nlp/ner_processor.py`` loads a checkpoint's tokenizer); training
one from scratch over the corpus is the piece a large-scale
training-data pipeline adds.  Byte-pair encoding's training loop is
"count adjacent symbol pairs over the word-frequency table, merge the
most frequent pair, repeat" — embarrassingly parallel per iteration,
with only a 1-row argmax crossing iterations.

Spark shape (the 100 TB story):
- The loop runs over the DISTINCT-WORD table, not the corpus: one
  corpus scan builds ``(word, freq)`` (map-side combined groupBy), and
  every BPE iteration after that touches only distinct words — at web
  scale that is ~10^8 rows regardless of corpus size, the same
  compression trick Sennrich's reference implementation uses with its
  ``collections.Counter`` vocab.
- Each iteration is ONE shuffle (pair-count groupBy) + a broadcast
  1-row argmax joined back in (no driver-side loop state, the
  ``graph.py`` dangling-mass pattern) + a narrow per-row fold that
  applies the merge left-to-right.  ``localCheckpoint`` truncates the
  plan per round so iteration N's plan does not re-derive rounds 1..N-1
  (the pagerank/BFS pattern).
- The argmax tie-break is total (count DESC, left ASC, right ASC), so
  the learned merge table is deterministic across partitionings,
  retries, and engines — required for a reproducible tokenizer.

Symbol inventory: per-word characters plus a terminal ``</w>``
end-of-word marker (Sennrich §3.2), so merges never cross word
boundaries and word-final units stay distinct from word-internal ones.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["word_counts", "bpe_pair_counts", "bpe_train", "bpe_encode"]

_EOW = "</w>"


def _words(text: Column) -> Column:
    """Whitespace tokens of lowercased text (the corpus-wide token
    convention shared with importance.py / text_stats.py)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over the corpus — the table every BPE iteration
    runs on.  One explode + one map-side-combined groupBy."""
    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(word: Column) -> Column:
    """Initial symbol sequence of a word: its characters + ``</w>``.
    Always ≥ 2 elements, so the adjacent-pair zip below never sees the
    empty/descending ``sequence(1, 0)`` edge case."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(_EOW)))


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs (every
    occurrence position counts, as in the reference algorithm)."""
    return F.arrays_zip(
        F.slice(sym, 1, F.size(sym) - 1).alias("left"),
        F.slice(sym, 2, F.size(sym) - 1).alias("right"),
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", k: int | None = None
) -> DataFrame:
    """First-iteration BPE merge candidates: adjacent character-pair
    frequencies over the word table, weighted by word frequency —
    ``(left, right, pair_freq)``, optionally top-``k`` by the training
    tie-break (freq DESC, left ASC, right ASC).

    Exact-integer output (counts only), so the mirror is plain SQL.
    Plan: corpus scan → word groupBy → pair explode (bounded: word
    length per distinct word) → pair groupBy; ``k`` lands as
    TakeOrderedAndProject, never a global sort.
    """
    wc = word_counts(docs, text_col)
    pairs = wc.select(
        "freq", F.explode(_adjacent_pairs(_symbols(F.col("word")))).alias("p")
    )
    counts = (
        pairs.select(F.col("p.left").alias("left"), F.col("p.right").alias("right"), "freq")
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("pair_freq"))
    )
    if k is not None:
        counts = counts.orderBy(
            F.desc("pair_freq"), F.asc("left"), F.asc("right")
        ).limit(k)
    return counts


def _apply_merge(sym: Column, left: Column, right: Column) -> Column:
    """Left-to-right non-overlapping replacement of (left, right) with
    their concatenation — the fold is equivalent to Sennrich's scan
    ``if s[i]==a and s[i+1]==b: emit ab, skip 2`` because a just-merged
    tail element equals ``a || b`` which (b being non-empty) can never
    equal ``a`` again within the same pass."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table ``(step, left, right, pair_freq)`` in learned order — the
    artifact a tokenizer ships (merges.txt).

    Per iteration: pair-count groupBy (one keyed shuffle), 1-row argmax
    with the total tie-break taken via ``limit(1)``
    (TakeOrderedAndProject — no global sort), broadcast back in with a
    1-row crossJoin, and a JVM-side fold applying the merge to every
    word's symbol array.  The word table is ``localCheckpoint``ed per
    round so the plan stays O(1) deep.  Stops early if no pair occurs
    twice (nothing left worth merging).

    Oracled since round 5 (__spark_entry__._bpe_merges_sql): the loop
    is unrolled as chained SQL CTEs, with DuckDB ``replace`` as the
    left-to-right merge application; a differential pytest against a
    pure-Python reference of the same algorithm remains in
    tests/test_tokenizer.py.
    """
    words = (
        word_counts(docs, text_col)
        .select(_symbols(F.col("word")).alias("sym"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = (
            words.select("freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best_rows = pairs.orderBy(
            F.desc("pair_freq"), F.asc("left"), F.asc("right")
        ).limit(1).collect()
        # the argmax is a 1-row bounded collect (the centroid-sample
        # class of driver action): its VALUE must enter the merge table
        # we return, so the driver holds it either way
        if not best_rows or best_rows[0]["pair_freq"] < 2:
            break
        best = best_rows[0]
        merges.append((step, best["left"], best["right"], best["pair_freq"]))
        words = words.select(
            _apply_merge(
                F.col("sym"), F.lit(best["left"]), F.lit(best["right"])
            ).alias("sym"),
            "freq",
        ).localCheckpoint(eager=True)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_freq bigint"
    )


def bpe_train_batched(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_k: int = 64,
) -> DataFrame:
    """Parallel-BPE trainer: learn ``n_merges`` merges in rounds of up
    to ``batch_k`` SYMBOL-DISJOINT merges — the scale path next to
    :func:`bpe_train`'s exact-sequential loop.

    ``bpe_train`` schedules one Spark job per merge (argmax → fold), a
    driver-paced sequence that no executor count parallelizes: a 32k
    vocabulary is 32k+ sequential jobs. This variant selects a BATCH of
    merges per round from one pair-count aggregation: the top candidates
    are scanned in the total tie-break order (freq DESC, left, right)
    and greedily kept while their symbols — left, right, AND the new
    token left||right — are disjoint from every symbol already kept in
    the round.  Disjointness makes the batch exact w.r.t. round-start
    counts (merging (a,b) cannot create, destroy, or overlap an
    occurrence of a disjoint (c,d)), so all kept merges apply in ONE
    fold pass over the word table, and 32k merges become ~n_merges /
    batch_k driver rounds.

    The known, documented deviation from strict-sequential BPE: pairs
    first CREATED by a merge (e.g. ("ab","c") after (a,b)) only become
    candidates next round, so merge ORDER can differ from
    :func:`bpe_train` when such a pair would out-rank the round's later
    selections.  ``batch_k=1`` degenerates to the sequential algorithm
    exactly (one pair per round, recount every round). Correctness is
    pinned differentially: batch_k=1 vs the sequential pure-Python
    reference, and batch_k>1 vs a pure-Python replica of THIS batched
    algorithm (tests/test_tokenizer.py).

    Per round: one keyed pair-count shuffle, one bounded driver collect
    (4*batch_k candidate rows — vocabulary-sized, never data-sized), one
    JVM fold with an O(batch_k) literal map, one localCheckpoint to keep
    the plan O(1) deep.
    """
    sep = "\x00"  # cannot occur inside a symbol (symbols are word chars)
    words = (
        word_counts(docs, text_col)
        .select(_symbols(F.col("word")).alias("sym"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    step = 0
    while step < n_merges:
        pairs = (
            words.select(
                "freq", F.explode(_adjacent_pairs(F.col("sym"))).alias("p")
            )
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("pair_freq"))
        )
        want = min(batch_k, n_merges - step)
        top = pairs.orderBy(
            F.desc("pair_freq"), F.asc("left"), F.asc("right")
        ).limit(max(4 * want, 16)).collect()
        used: set[str] = set()
        chosen: list[tuple[str, str, int]] = []
        for r in top:
            if r["pair_freq"] < 2:
                break
            a, b = r["left"], r["right"]
            if a in used or b in used or (a + b) in used:
                continue
            chosen.append((a, b, r["pair_freq"]))
            used.update((a, b, a + b))
            if len(chosen) >= want:
                break
        if not chosen:
            break
        for a, b, cnt in chosen:
            step += 1
            merges.append((step, a, b, cnt))
        merge_map = F.create_map(
            *[
                F.lit(x)
                for a, b, _ in chosen
                for x in (a + sep + b, a + b)
            ]
        )
        joined = lambda acc, x: F.concat(F.element_at(acc, -1), F.lit(sep), x)  # noqa: E731
        words = words.select(
            F.aggregate(
                F.col("sym"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & F.element_at(merge_map, joined(acc, x)).isNotNull(),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.element_at(merge_map, joined(acc, x))),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("sym"),
            "freq",
        ).localCheckpoint(eager=True)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_freq bigint"
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus with a trained merge table — the apply half of
    BPE (tokenize for packing / token accounting): returns
    ``(id, n_words, n_bpe_tokens)`` per document.

    The merge table (step, left, right, ...) is broadcast to every
    executor (it is vocabulary-sized: thousands of rows); each Arrow
    batch applies merges per DISTINCT word in learned order with a
    per-batch word cache, so a word repeated across the batch is
    encoded once (the same distinct-word compression the trainer uses).
    Oracled since round 5 (__spark_entry__._bpe_token_counts_sql):
    the mirror reads per-word counts off the unrolled training chain's
    final state, which equals rank-greedy encoding on training-corpus
    words (corpus-guarded by tests/test_bpe_oracle_guard.py); the
    differential pytest that encodes with the SAME pure-Python
    implementation used to verify :func:`bpe_train` remains in
    tests/test_tokenizer.py.
    """
    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("step").collect()
    ]
    rank = {pair: i for i, pair in enumerate(ranked)}
    b_rank = docs.sparkSession.sparkContext.broadcast(rank)

    @pandas_udf("struct<n_words: bigint, n_bpe_tokens: bigint>")
    def encode(text: pd.Series) -> pd.DataFrame:
        rk = b_rank.value
        cache: dict[str, int] = {}

        def word_len(word: str) -> int:
            n = cache.get(word)
            if n is not None:
                return n
            sym = list(word) + [_EOW]
            while len(sym) > 1:
                best, best_r, best_i = None, None, None
                for i in range(len(sym) - 1):
                    r = rk.get((sym[i], sym[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best, best_r, best_i = (sym[i], sym[i + 1]), r, i
                if best is None:
                    break
                # apply THIS merge left-to-right non-overlapping
                out, i = [], 0
                while i < len(sym):
                    if (
                        i + 1 < len(sym)
                        and sym[i] == best[0]
                        and sym[i + 1] == best[1]
                    ):
                        out.append(best[0] + best[1])
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            cache[word] = len(sym)
            return len(sym)

        n_words, n_tok = [], []
        for t in text:
            ws = [w for w in (t or "").lower().split() if w]
            n_words.append(len(ws))
            n_tok.append(sum(word_len(w) for w in ws))
        return pd.DataFrame({"n_words": n_words, "n_bpe_tokens": n_tok})

    return docs.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("_e"),
    ).select(
        id_col,
        F.col("_e.n_words").alias("n_words"),
        F.col("_e.n_bpe_tokens").alias("n_bpe_tokens"),
    )
