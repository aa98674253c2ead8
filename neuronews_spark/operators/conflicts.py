"""Contested-claim conflict graph: cross-source contradiction detection.

Clean-room re-expression of the reference's conflict detector
(``/root/reference/src/argument_mining/conflict_graph.py:62-321``):
within-topic claim pairs from different sources are scored with
bag-of-words cosine similarity and classified

  direct   sim ≥ 0.80 AND (opposite polarity OR explicit contradiction),
           or explicit contradiction with sim ≥ 0.45
  implied  sim ≥ 0.65 AND (explicit OR cross-format OR opposite
           polarity), or explicit contradiction with sim ≥ 0.30

(conflict_graph.py:133-167).  Polarity is the keyword pos/neg count sign
(…:116-130); tokens are lowercase ≥3-char words minus a stopword list
(…:43-66).

Spark-first pivot: the reference loads ≤300 claims onto the driver and
tests pairs in a nested loop capped at 200 pairs/topic
(conflict_graph.py:263-296) — an iteration-order-dependent artifact of
the single process.  Here the pairwise cosine is an inverted-index join:
explode term frequencies, equi-join on (topic, term), one groupBy per
pair for the dot product — only pairs sharing ≥1 token are ever
materialized, which is lossless because every conflict path requires
sim ≥ 0.30 > 0.  No cap is needed (the work is distributed); at 100 TB
the hot-term skew knob is ``max_df_frac`` (drop terms appearing in more
than that fraction of claims before the join — same guard as
evidence.find_evidence), default off for reference parity.  All math is
Column-level (no UDFs) and mirrored in DuckDB by the driver oracle
(``claim_conflicts``).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# conflict_graph.py:43-58
STOPWORDS = [
    "the", "and", "for", "that", "this", "with", "has", "have", "had",
    "are", "was", "were", "not", "but", "from", "they", "their", "been",
    "will", "can", "would", "could", "should", "may", "might", "shall",
    "into", "out", "its", "our", "all", "more", "also", "than", "which",
    "said", "says", "say", "according", "per", "cent", "year", "years",
    "new", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "first", "second", "third", "last", "next", "only",
    "other", "some", "both", "each", "such", "about", "over", "after",
    "before", "while", "when", "where", "how", "what", "who", "whom",
    "any", "most", "many", "much", "very", "just", "still", "already",
]

SIM_DIRECT = 0.80  # conflict_graph.py:60
SIM_IMPLIED = 0.65  # conflict_graph.py:61
SIM_EXPLICIT_DIRECT = 0.45  # conflict_graph.py:158
SIM_EXPLICIT_IMPLIED = 0.30  # conflict_graph.py:164

TOKEN_RE = r"\b[a-z]{3,}\b"  # conflict_graph.py:67
POS_RE = (
    r"(?i)\b(increase|rise|improve|grow|gain|expand|support|positive|higher|up)\b"
)  # conflict_graph.py:118-120
NEG_RE = (
    r"(?i)\b(decrease|fall|decline|shrink|loss|contract|oppose|negative|lower|down)\b"
)  # conflict_graph.py:122-124


def claim_tokens(text: Column) -> Column:
    """Lowercase ≥3-letter tokens minus stopwords (conflict_graph.py:66-67)."""
    return F.filter(
        F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0),
        lambda t: ~t.isin(STOPWORDS),
    )


def polarity(text: Column) -> Column:
    """+1 / -1 / 0 keyword polarity (conflict_graph.py:116-130)."""
    pos = F.size(F.regexp_extract_all(text, F.lit(POS_RE), 1))
    neg = F.size(F.regexp_extract_all(text, F.lit(NEG_RE), 1))
    return F.when(pos > neg, 1).when(neg > pos, -1).otherwise(0)


def detect_conflicts(
    claims: DataFrame,
    explicit_pairs: DataFrame | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Pairwise conflicts among ``claims(claim_id, claim_text,
    source_type, topic, source_name)``.

    ``explicit_pairs`` — optional (claim_id_a, claim_id_b) frame of
    claim_evidence 'contradicts' links, canonical a<b (conflict_graph.py:
    236-249); pairs not listed are non-explicit.  Returns one row per
    conflicting pair: canonical (claim_id_a < claim_id_b), conflict_type,
    similarity_score (round 4), source_type_a/b, topic.  computed_at is
    intentionally omitted (wall-clock; callers stamp on write).
    """
    attrs = claims.select(
        "claim_id",
        "source_type",
        "topic",
        "source_name",
        polarity(F.col("claim_text")).alias("pol"),
    )
    tf = (
        claims.select(
            "claim_id", "topic", F.explode(claim_tokens(F.col("claim_text"))).alias("term")
        )
        .groupBy("claim_id", "topic", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    if max_df_frac is not None:
        n = claims.count()
        hot = (
            tf.groupBy("term")
            .agg(F.countDistinct("claim_id").alias("df"))
            .filter(F.col("df") > max_df_frac * n)
            .select("term")
        )
        tf = tf.join(F.broadcast(hot), "term", "left_anti")
    norms = tf.groupBy("claim_id").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("norm")
    )

    a = tf.select(
        F.col("claim_id").alias("claim_id_a"), "topic", "term", F.col("cnt").alias("cnt_a")
    )
    b = tf.select(
        F.col("claim_id").alias("claim_id_b"), "topic", "term", F.col("cnt").alias("cnt_b")
    )
    dots = (
        a.join(b, ["topic", "term"])
        .filter(F.col("claim_id_a") < F.col("claim_id_b"))
        .groupBy("topic", "claim_id_a", "claim_id_b")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
    )
    sims = (
        dots.join(
            norms.select(F.col("claim_id").alias("claim_id_a"), F.col("norm").alias("na")),
            "claim_id_a",
        )
        .join(
            norms.select(F.col("claim_id").alias("claim_id_b"), F.col("norm").alias("nb")),
            "claim_id_b",
        )
        .withColumn("sim", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4))
    )

    aa = attrs.select(
        F.col("claim_id").alias("claim_id_a"),
        F.col("source_type").alias("source_type_a"),
        F.col("source_name").alias("src_a"),
        F.col("pol").alias("pol_a"),
    )
    ab = attrs.select(
        F.col("claim_id").alias("claim_id_b"),
        F.col("source_type").alias("source_type_b"),
        F.col("source_name").alias("src_b"),
        F.col("pol").alias("pol_b"),
    )
    paired = (
        sims.join(aa, "claim_id_a")
        .join(ab, "claim_id_b")
        .filter(F.col("src_a") != F.col("src_b"))  # conflict_graph.py:277
    )
    if explicit_pairs is not None:
        paired = paired.join(
            explicit_pairs.select("claim_id_a", "claim_id_b").withColumn(
                "explicit", F.lit(True)
            ),
            ["claim_id_a", "claim_id_b"],
            "left",
        ).fillna({"explicit": False})
    else:
        paired = paired.withColumn("explicit", F.lit(False))

    opp = (F.col("pol_a") * F.col("pol_b")) == -1
    cross = F.col("source_type_a") != F.col("source_type_b")
    sim = F.col("sim")
    exp = F.col("explicit")
    ctype = (
        F.when((sim >= SIM_DIRECT) & (opp | exp), F.lit("direct"))
        .when(exp & (sim >= SIM_EXPLICIT_DIRECT), F.lit("direct"))
        .when((sim >= SIM_IMPLIED) & (exp | cross | opp), F.lit("implied"))
        .when(exp & (sim >= SIM_EXPLICIT_IMPLIED), F.lit("implied"))
    )
    return (
        paired.withColumn("conflict_type", ctype)
        .filter(F.col("conflict_type").isNotNull())
        .select(
            "claim_id_a",
            "claim_id_b",
            "conflict_type",
            F.col("sim").alias("similarity_score"),
            "source_type_a",
            "source_type_b",
            "topic",
        )
    )


def controversy_graph(
    conflicts: DataFrame,
    claims: DataFrame,
    limit: int = 60,
) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) for the controversy endpoints
    (conflict_graph.py:329-434): the top-``limit`` conflicts by
    similarity feed a force-directed graph — one edge per conflict, one
    node per distinct claim carrying the topic/conflict_type of the row
    that FIRST introduced it (the reference's dict-insertion semantics,
    a-node before b-node within a row).

    Determinism pivot: the reference orders by similarity alone, leaving
    ties to the SQL engine; the (sim desc, claim_id_a, claim_id_b)
    tiebreak here makes the cut and the first-introduction winner stable.
    The limit is a TakeOrdered (no global sort materialisation); node
    dedup is one window over ≤ 2·limit rows."""
    from pyspark.sql import Window

    order = [F.col("similarity_score").desc(), "claim_id_a", "claim_id_b"]
    ranked = (
        conflicts.withColumn("_rk", F.row_number().over(Window.orderBy(*order)))
        .filter(F.col("_rk") <= limit)
    )
    edges = ranked.select(
        F.col("claim_id_a").alias("source"),
        F.col("claim_id_b").alias("target"),
        F.round("similarity_score", 3).alias("severity"),
        F.lit("contradicts").alias("relation"),
        "conflict_type",
    )
    sides = ranked.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("_rk") * 2).alias("ord"),
                    F.col("claim_id_a").alias("cid"),
                    F.col("topic").alias("topic"),
                    F.col("conflict_type").alias("conflict_type"),
                ),
                F.struct(
                    (F.col("_rk") * 2 + 1).alias("ord"),
                    F.col("claim_id_b").alias("cid"),
                    F.col("topic").alias("topic"),
                    F.col("conflict_type").alias("conflict_type"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    firsts = (
        sides.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("cid").orderBy("ord"))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "ord")
    )
    nodes = firsts.join(
        claims.select(
            F.col("claim_id").alias("cid"),
            F.col("source_name").alias("label"),
            "source_type",
        ),
        "cid",
    ).select(
        F.col("cid").alias("id"),
        "label",
        "source_type",
        "topic",
        "conflict_type",
        F.lit(0.5).alias("confidence"),  # conflict_graph.py:411 default
    )
    return nodes, edges


# ----------------------------------------------------------------------
# Python kernel mirror (differential tests only)
# ----------------------------------------------------------------------

_PY_TOKEN = re.compile(TOKEN_RE)
_PY_POS = re.compile(POS_RE[4:], re.I)
_PY_NEG = re.compile(NEG_RE[4:], re.I)
_STOP = set(STOPWORDS)


def cosine_py(text_a: str, text_b: str) -> float:
    ta = [w for w in _PY_TOKEN.findall(text_a.lower()) if w not in _STOP]
    tb = [w for w in _PY_TOKEN.findall(text_b.lower()) if w not in _STOP]
    if not ta or not tb:
        return 0.0
    fa: dict[str, int] = {}
    fb: dict[str, int] = {}
    for w in ta:
        fa[w] = fa.get(w, 0) + 1
    for w in tb:
        fb[w] = fb.get(w, 0) + 1
    shared = set(fa) & set(fb)
    if not shared:
        return 0.0
    dot = sum(fa[w] * fb[w] for w in shared)
    na = math.sqrt(sum(v * v for v in fa.values()))
    nb = math.sqrt(sum(v * v for v in fb.values()))
    return round(dot / (na * nb), 4)


def polarity_py(text: str) -> int:
    pos = len(_PY_POS.findall(text))
    neg = len(_PY_NEG.findall(text))
    return 1 if pos > neg else (-1 if neg > pos else 0)


def detect_conflict_py(
    text_a: str,
    stype_a: str,
    text_b: str,
    stype_b: str,
    explicit: bool = False,
) -> tuple[str, float] | None:
    """(conflict_type, sim) or None — conflict_graph.py:133-167."""
    sim = cosine_py(text_a, text_b)
    opp = polarity_py(text_a) * polarity_py(text_b) == -1
    cross = stype_a != stype_b
    if sim >= SIM_DIRECT and (opp or explicit):
        return "direct", sim
    if explicit and sim >= SIM_EXPLICIT_DIRECT:
        return "direct", sim
    if sim >= SIM_IMPLIED and (explicit or cross or opp):
        return "implied", sim
    if explicit and sim >= SIM_EXPLICIT_IMPLIED:
        return "implied", sim
    return None
