"""dbt staging port tests (stg_entities.sql parity).

Reference: /root/reference/dbt/neuro_news/models/staging/stg_entities.sql
(:12-20 surrogate mapping, :36-55 type CASE, :58-63 clamp, :79-112 dedup).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from neuronews_spark.operators.staging import (
    dbt_surrogate_key,
    normalize_entity_type,
    stg_entities,
    stg_news_mapping,
)

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_dbt_surrogate_key_matches_dbt_utils_semantics(spark):
    df = spark.createDataFrame(
        [("https://x/1", "src"), (None, "src")], "url string, source string"
    )
    got = [
        r["k"]
        for r in df.select(
            dbt_surrogate_key(F.col("url"), F.col("source")).alias("k")
        ).collect()
    ]
    exp0 = hashlib.md5(b"https://x/1-src").hexdigest()
    exp1 = hashlib.md5(b"_dbt_utils_surrogate_key_null_-src").hexdigest()
    assert got == [exp0, exp1]


def test_normalize_entity_type_covers_reference_arms(spark):
    cases = {
        "per": "PERSON", " Organization ": "ORG", "gpe": "GPE",
        "location": "LOC", "EVENT": "EVENT", "prod": "PRODUCT",
        "work-of-art": "WORK_OF_ART", "legal": "LAW", "lang": "LANGUAGE",
        "date": "DATE", "time": "TIME", "%": "PERCENT",
        "currency": "MONEY", "qty": "QUANTITY", "ord": "ORDINAL",
        "number": "CARDINAL", "martian": "MISC",
    }
    df = spark.createDataFrame([(k,) for k in cases], "t string")
    got = {
        r["t"]: r["n"]
        for r in df.select(
            "t", normalize_entity_type(F.col("t")).alias("n")
        ).collect()
    }
    assert got == cases


def _raw(spark, rows):
    return spark.createDataFrame(
        rows,
        "article_id long, entity_text string, entity_type string, "
        "start_char long, end_char long, confidence_score double, "
        "extracted_at timestamp, created_at timestamp",
    )


def _mapping(spark):
    raw_news = spark.createDataFrame(
        [(1, "https://x/1", "src"), (2, "https://x/2", "src")],
        "raw_article_id long, url string, source string",
    )
    stg_news = raw_news.select(
        dbt_surrogate_key(F.col("url"), F.col("source")).alias("article_id")
    )
    return stg_news_mapping(raw_news, stg_news)


def test_stg_entities_clamp_filter_and_latest_dedup(spark):
    later = TS + dt.timedelta(minutes=5)
    rows = [
        # duplicate natural key — later extracted_at must win
        (1, "Alice ", "per", 3, None, 0.7, TS, TS),
        (1, "Alice ", "per", 3, None, 0.9, later, TS),
        # confidence > 1 → clamped to 1.0
        (1, "Bob", "ORG", 0, 10, 1.3, TS, TS),
        # below the 0.5 floor → filtered out entirely
        (2, "Carol", "LOC", 0, 5, 0.4, TS, TS),
        # blank type → filtered
        (2, "Dan", "  ", 0, 5, 0.9, TS, TS),
    ]
    out = {
        (r["article_id"], r["entity_text"]): r
        for r in stg_entities(_raw(spark, rows), _mapping(spark)).collect()
    }
    assert len(out) == 2  # Alice (deduped) + Bob
    sk1 = hashlib.md5(b"https://x/1-src").hexdigest()
    alice = out[(sk1, "Alice")]
    # later duplicate won: its raw confidence 0.9 survived
    assert alice["confidence_score"] == 0.9
    assert alice["entity_type"] == "PERSON"
    # end_char null → start + length(raw text incl. trailing space)
    assert alice["end_position"] == 3 + len("Alice ")
    assert alice["entity_length"] == len("Alice")
    bob = out[(sk1, "Bob")]
    assert bob["confidence_score"] == 1.0 and bob["entity_type"] == "ORG"
