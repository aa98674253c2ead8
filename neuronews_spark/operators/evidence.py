"""Claim-evidence search + stance aggregation + drift detection.

Re-expression of the reference's argument-mining evidence pipeline
(``/root/reference/src/argument_mining/evidence.py:22-215``,
``stance_aggregator.py:20-117``, ``drift_detector.py:20-100``,
``api/routes/argument_routes.py:54-63``) as distributed DataFrame plans:

* ``find_evidence`` — for each claim, search a sentence corpus for
  supporting/contradicting evidence by TF-IDF cosine similarity
  (threshold 0.20, max 10 per claim, one sentence per evidence doc,
  same-doc sentences excluded — evidence.py:162-215).

  The reference fits a fresh sklearn ``TfidfVectorizer`` per claim over
  ``[claim] + corpus`` (evidence.py:120-131) — an O(claims × corpus)
  driver loop that cannot scale. Spark-first deviation (documented):
  ONE corpus-level fit over claims ∪ sentences, then a sparse
  token-intersection join — weights only differ by the single pseudo-doc
  the reference adds per fit, and the join touches only (text, term)
  pairs that actually share a term, so the plan is two shuffles (term
  df, pair dot-product) instead of a driver loop. Same vectorizer
  semantics otherwise: token pattern ``\\w\\w+``, lowercase, unigrams +
  bigrams, sublinear tf ``1+ln(tf)``, smooth idf ``ln((1+N)/(1+df))+1``,
  l2 normalization.

* relation classification — ≥2 distinct contradiction-signal words in
  the evidence sentence → "contradicts", else "supports"
  (evidence.py:40-56,105-109,207).

* ``classify_stance`` — 4-class stance from evidence counts + claim
  confidence (argument_routes.py:54-63).

* ``stance_by_source`` — per-(source, topic) stance label counts
  (stance_aggregator.py:58-117 aggregation shape).

* ``stance_drift`` — consecutive-window dominant-stance pivots with
  confidence delta > 0.2 (drift_detector.py:21-100).

At 100 TB: the term-join is the classic sparse similarity join — skew
lives in high-df terms (stopwords), so ``max_df_frac`` optionally prunes
terms present in more than that fraction of texts (they contribute near
zero weight after idf anyway); pruning is off by default to keep exact
reference semantics and is reported via the returned plan, never silent.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# evidence.py:35-38
SIMILARITY_THRESHOLD = 0.20
MAX_EVIDENCE = 10

# evidence.py:40-52
CONTRADICTION_SIGNALS = [
    "not", "no", "never", "neither", "nor",
    "didn't", "doesn't", "don't", "won't", "wasn't", "weren't", "hasn't",
    "haven't", "wouldn't", "couldn't", "shouldn't", "cannot", "can't",
    "refute", "refutes", "refuted", "dispute", "disputes", "disputed",
    "contradict", "contradicts", "contradicted",
    "deny", "denies", "denied", "reject", "rejects", "rejected",
    "challenge", "challenges", "challenged", "debunk", "debunks", "debunked",
    "false", "incorrect", "wrong", "inaccurate", "misleading", "untrue",
    "contrary", "despite", "however", "though", "although",
    "but", "yet", "while", "whereas", "nevertheless",
]
CONTRADICTION_THRESHOLD = 2  # evidence.py:56

# sklearn TfidfVectorizer default token pattern \w\w+ (ASCII approximation;
# the synthetic corpus is ASCII). Apostrophes split tokens, so "didn't"
# tokenizes to ("didn", "t") for TF-IDF — but the contradiction signals
# keep apostrophes because _contradiction_score uses \b\w+\b on the raw
# sentence (evidence.py:105-109), where ' is a boundary: "didn't" yields
# {didn, t}. The reference therefore NEVER matches its own apostrophe
# signals; we mirror that faithfully by matching plain \w+ words.
_TFIDF_TOKEN = r"[A-Za-z0-9_]{2,}"
_WORD = r"[A-Za-z0-9_]+"


def _terms(text: Column) -> Column:
    """Unigram + bigram term array of a lowercased text column."""
    uni = F.regexp_extract_all(F.lower(text), F.lit(_TFIDF_TOKEN), F.lit(0))
    bi = F.zip_with(
        uni,
        F.slice(uni, 2, F.greatest(F.size(uni) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # zip_with pads the shorter side with null → trailing "a" concat_ws
    # artifacts; keep only true pairs
    bi = F.slice(bi, 1, F.greatest(F.size(uni) - 1, F.lit(0)))
    return F.concat(uni, bi)


def tfidf_weights(
    texts: DataFrame,
    id_col: str = "text_id",
    text_col: str = "txt",
    max_df_frac: float | None = None,
) -> DataFrame:
    """L2-normalized sublinear TF-IDF term weights, one row per
    (text_id, term, weight). sklearn-equivalent math (see module doc)."""
    n_texts = texts.count()
    tf = (
        texts.select(F.col(id_col).alias("text_id"), _terms(F.col(text_col)).alias("t"))
        .select("text_id", F.explode("t").alias("term"))
        .groupBy("text_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_df_frac is not None:
        df_ = df_.filter(F.col("df") <= max_df_frac * n_texts)
    w = (
        tf.join(df_, "term")
        .select(
            "text_id",
            "term",
            (
                (F.lit(1.0) + F.log("cnt"))
                * (F.log((F.lit(1.0) + n_texts) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0))
            ).alias("w"),
        )
    )
    norm = w.groupBy("text_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("l2"))
    return w.join(norm, "text_id").select(
        "text_id", "term", (F.col("w") / F.col("l2")).alias("weight")
    )


def contradiction_score(sentence: Column) -> Column:
    """Count of distinct contradiction-signal words present
    (evidence.py:105-109: set of \\b\\w+\\b words ∩ signals)."""
    words = F.array_distinct(
        F.regexp_extract_all(F.lower(sentence), F.lit(_WORD), F.lit(0))
    )
    return F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in CONTRADICTION_SIGNALS]))
    )


def find_evidence(
    claims: DataFrame,
    sentences: DataFrame,
    threshold: float = SIMILARITY_THRESHOLD,
    max_evidence: int = MAX_EVIDENCE,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Evidence rows (claim_doc, claim_idx, ev_doc, ev_idx, sim, relation).

    ``claims``: (doc, sent_idx, claim_text); ``sentences``: (doc,
    sent_idx, sentence). One TF-IDF fit over claims ∪ sentences, sparse
    term join, then the reference's post-filters: same-doc exclusion,
    sim ≥ threshold, best sentence per (claim, evidence doc), top
    ``max_evidence`` docs per claim by descending sim (evidence.py:
    162-215; deterministic tie-break by (ev_doc, ev_idx) where the
    reference relies on stable sort order).
    """
    c = claims.select(
        F.concat_ws("#", F.lit("c"), "doc", "sent_idx").alias("text_id"),
        F.col("doc").alias("c_doc"),
        F.col("sent_idx").alias("c_idx"),
        F.col("claim_text").alias("txt"),
    )
    s = sentences.select(
        F.concat_ws("#", F.lit("s"), "doc", "sent_idx").alias("text_id"),
        F.col("doc").alias("s_doc"),
        F.col("sent_idx").alias("s_idx"),
        F.col("sentence").alias("txt"),
    )
    weights = tfidf_weights(
        c.select("text_id", "txt").unionByName(s.select("text_id", "txt")),
        max_df_frac=max_df_frac,
    )
    cw = weights.join(c.select("text_id", "c_doc", "c_idx"), "text_id").drop("text_id")
    sw = weights.join(s.select("text_id", "s_doc", "s_idx"), "text_id").drop("text_id")
    pairs = (
        cw.alias("a")
        .join(sw.alias("b"), on="term")
        .filter(F.col("a.c_doc") != F.col("b.s_doc"))  # evidence.py:173
        .groupBy("c_doc", "c_idx", "s_doc", "s_idx")
        .agg(F.sum(F.col("a.weight") * F.col("b.weight")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
    # best sentence per evidence doc (evidence.py:193-197), then top-k
    # docs per claim (``indexed[:max_results]`` :191)
    per_doc = Window.partitionBy("c_doc", "c_idx", "s_doc").orderBy(
        F.desc("sim"), "s_idx"
    )
    per_claim = Window.partitionBy("c_doc", "c_idx").orderBy(
        F.desc("sim"), "s_doc", "s_idx"
    )
    best = (
        pairs.withColumn("rn_doc", F.row_number().over(per_doc))
        .filter(F.col("rn_doc") == 1)
        .withColumn("rn", F.row_number().over(per_claim))
        .filter(F.col("rn") <= max_evidence)
    )
    return (
        best.join(
            sentences.select(
                F.col("doc").alias("s_doc"),
                F.col("sent_idx").alias("s_idx"),
                "sentence",
            ),
            ["s_doc", "s_idx"],
        )
        .select(
            F.col("c_doc").alias("claim_doc"),
            F.col("c_idx").alias("claim_idx"),
            F.col("s_doc").alias("ev_doc"),
            F.col("s_idx").alias("ev_idx"),
            F.round("sim", 6).alias("sim"),
            F.when(
                contradiction_score(F.col("sentence")) >= CONTRADICTION_THRESHOLD,
                F.lit("contradicts"),
            )
            .otherwise(F.lit("supports"))
            .alias("relation"),
        )
    )


def classify_stance(supports: Column, contradicts: Column, confidence: Column) -> Column:
    """4-class stance label (argument_routes.py:54-63)."""
    return (
        F.when(confidence < 0.4, F.lit("ambiguous"))
        .when((contradicts > supports) & (contradicts > 0), F.lit("critical"))
        .when(supports > 0, F.lit("supportive"))
        .otherwise(F.lit("neutral"))
    )


def claim_stances(claims: DataFrame, evidence: DataFrame) -> DataFrame:
    """Per-claim stance: evidence sup/con counts joined back to the claim
    (argument_routes.py:688-744 fallback derivation). ``claims`` must
    carry (doc, sent_idx, confidence)."""
    ev = evidence.groupBy(
        F.col("claim_doc").alias("doc"), F.col("claim_idx").alias("sent_idx")
    ).agg(
        F.sum(F.when(F.col("relation") == "supports", 1).otherwise(0)).alias("sup"),
        F.sum(F.when(F.col("relation") == "contradicts", 1).otherwise(0)).alias("con"),
    )
    base = claims.join(ev, ["doc", "sent_idx"], "left").fillna(
        {"sup": 0, "con": 0}
    )
    return base.withColumn(
        "stance", classify_stance(F.col("sup"), F.col("con"), F.col("confidence"))
    )


def stance_by_source(stanced: DataFrame, docs: DataFrame) -> DataFrame:
    """Stance breakdown per (source, topic): one row per group with
    supportive/critical/neutral/ambiguous counts, total, avg confidence
    (argument_routes.py:640-663 aggregation; stance_aggregator.py:58-96
    grouping shape). ``docs`` must carry (doc_id, source, topic)."""
    joined = stanced.join(
        docs.select(F.col("doc_id").alias("doc"), "source", "topic"), "doc"
    )
    cnt = lambda lbl: F.sum(  # noqa: E731
        F.when(F.col("stance") == lbl, 1).otherwise(0)
    ).alias(lbl)
    return joined.groupBy("source", "topic").agg(
        cnt("supportive"),
        cnt("critical"),
        cnt("neutral"),
        cnt("ambiguous"),
        F.count("*").alias("total"),
        F.round(F.avg("confidence"), 6).alias("confidence"),
    )


# drift_detector.py:21-26 dominant(): max by count. Python's max() breaks
# ties by dict insertion order supportive→critical→neutral→ambiguous;
# made explicit here so Spark and any SQL mirror agree.
_STANCE_PRIORITY = ["supportive", "critical", "neutral", "ambiguous"]


def stance_drift(
    windows: DataFrame, conf_delta_threshold: float = 0.2
) -> DataFrame:
    """Consecutive-window dominant-stance pivots (drift_detector.py:29-100).

    ``windows``: one row per (source, topic, window_start, stance) with
    (document_count, confidence). Emits (source, topic, from_window,
    to_window, from_stance, to_stance, confidence_delta) where the
    dominant stance changed OR |Δ avg confidence| > threshold. Avg
    confidence per window is the count-weighted mean over all its stance
    rows divided by total docs (drift_detector.py:21-26)."""
    per_win = (
        windows.groupBy("source", "topic", "window_start")
        .agg(
            F.max_by(
                "stance",
                F.struct(
                    F.col("document_count"),
                    # higher priority (earlier in list) wins ties under max_by
                    F.lit(len(_STANCE_PRIORITY))
                    - F.array_position(
                        F.array(*[F.lit(s) for s in _STANCE_PRIORITY]), F.col("stance")
                    ),
                ),
            ).alias("dominant"),
            (
                F.sum(F.col("confidence") * F.col("document_count"))
                / F.greatest(F.sum("document_count"), F.lit(1))
            ).alias("avg_conf"),
        )
    )
    w = Window.partitionBy("source", "topic").orderBy("window_start")
    lagged = per_win.select(
        "source",
        "topic",
        F.lag("window_start").over(w).alias("from_window"),
        F.col("window_start").alias("to_window"),
        F.lag("dominant").over(w).alias("from_stance"),
        F.col("dominant").alias("to_stance"),
        F.round(F.abs(F.col("avg_conf") - F.lag("avg_conf").over(w)), 6).alias(
            "confidence_delta"
        ),
    ).filter(F.col("from_window").isNotNull())
    return lagged.filter(
        (F.col("from_stance") != F.col("to_stance"))
        | (F.col("confidence_delta") > conf_delta_threshold)
    )


# ------------------------------------------------------- python mirror

def tfidf_weights_py(texts: dict[str, str]) -> dict[str, dict[str, float]]:
    """Driver-side mirror of :func:`tfidf_weights` for differential tests."""
    terms_by_id = {}
    for tid, txt in texts.items():
        uni = re.findall(_TFIDF_TOKEN, txt.lower())
        terms_by_id[tid] = uni + [f"{a} {b}" for a, b in zip(uni, uni[1:])]
    n = len(texts)
    df: dict[str, int] = {}
    for terms in terms_by_id.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    out = {}
    for tid, terms in terms_by_id.items():
        cnt: dict[str, int] = {}
        for t in terms:
            cnt[t] = cnt.get(t, 0) + 1
        w = {
            t: (1.0 + math.log(c)) * (math.log((1.0 + n) / (1.0 + df[t])) + 1.0)
            for t, c in cnt.items()
        }
        l2 = math.sqrt(sum(v * v for v in w.values())) or 1.0
        out[tid] = {t: v / l2 for t, v in w.items()}
    return out


def cosine_py(a: dict[str, float], b: dict[str, float]) -> float:
    return sum(w * b[t] for t, w in a.items() if t in b)
