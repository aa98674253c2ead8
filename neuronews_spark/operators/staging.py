"""dbt staging-layer port: surrogate-key mapping + entity cleaning.

Port of ``/root/reference/dbt/neuro_news/models/staging/stg_entities.sql``:

* raw→staging article mapping through ``dbt_utils.generate_surrogate_key``
  over (url, source) (:12-20)
* ``entity_id`` surrogate over (raw article_id, entity_text, entity_type,
  start_char) (:27)
* entity-type normalization CASE with every variant spelling (:36-55)
* confidence clamp to [0, 1] (:58-63)
* position cleaning + entity_length (:66-71)
* latest-version window dedup on the natural key, ordered by
  extracted_at/created_at descending (:79-112)

Deviation: ``dbt_loaded_at`` (``current_timestamp``) is omitted — every
output of this engine is deterministic and oracle-hashed.

All of it is pure Column math over two joins; the widest shuffle carries
the raw-entity rows keyed by raw article id, and the mapping side is
broadcast-able (one row per article).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DBT_NULL = "_dbt_utils_surrogate_key_null_"

# (canonical, variant spellings) — stg_entities.sql:36-55
ENTITY_TYPE_NORM: list[tuple[str, tuple[str, ...]]] = [
    ("PERSON", ("PERSON", "PER")),
    ("ORG", ("ORG", "ORGANIZATION")),
    ("GPE", ("GPE", "GEOPOLITICAL")),
    ("LOC", ("LOC", "LOCATION")),
    ("EVENT", ("EVENT",)),
    ("PRODUCT", ("PRODUCT", "PROD")),
    ("WORK_OF_ART", ("WORK_OF_ART", "WORK-OF-ART", "ART")),
    ("LAW", ("LAW", "LEGAL")),
    ("LANGUAGE", ("LANGUAGE", "LANG")),
    ("DATE", ("DATE",)),
    ("TIME", ("TIME",)),
    ("PERCENT", ("PERCENT", "PERCENTAGE", "%")),
    ("MONEY", ("MONEY", "MONETARY", "CURRENCY")),
    ("QUANTITY", ("QUANTITY", "QTY")),
    ("ORDINAL", ("ORDINAL", "ORD")),
    ("CARDINAL", ("CARDINAL", "CARD", "NUMBER")),
]


def dbt_surrogate_key(*cols: Column) -> Column:
    """``dbt_utils.generate_surrogate_key`` parity: md5 of the '-'-joined
    string casts, nulls replaced by dbt's sentinel value."""
    parts = [F.coalesce(c.cast("string"), F.lit(_DBT_NULL)) for c in cols]
    return F.md5(F.concat_ws("-", *parts))


def normalize_entity_type(entity_type: Column) -> Column:
    """The stg_entities type-normalization CASE (:36-55); unknown, null,
    and blank all fall through to MISC."""
    up = F.upper(F.trim(entity_type))
    expr: Column | None = None
    for canonical, variants in ENTITY_TYPE_NORM:
        cond = up.isin(*variants)
        expr = F.when(cond, canonical) if expr is None else expr.when(cond, canonical)
    return expr.otherwise(F.lit("MISC"))


def stg_news_mapping(raw_news: DataFrame, stg_news: DataFrame) -> DataFrame:
    """raw article id → staging article id (stg_entities.sql:12-20): the
    surrogate key is REGENERATED from the raw columns and inner-joined to
    the staging model's stored key."""
    rn = raw_news.select(
        F.col("raw_article_id"),
        dbt_surrogate_key(F.col("url"), F.col("source")).alias("_sk"),
        "url",
        F.col("source").alias("source_name"),
    )
    # one row per article on BOTH sides — a plain equi-join on the
    # regenerated key (never force-broadcast: the staging model is
    # corpus-sized; AQE may still broadcast it at small scale)
    return rn.join(
        stg_news.select(F.col("article_id").alias("staging_article_id")),
        rn["_sk"] == F.col("staging_article_id"),
    ).select("raw_article_id", "staging_article_id", "url", "source_name")


def stg_entities(raw_entities: DataFrame, mapping: DataFrame) -> DataFrame:
    """The cleaned + deduplicated staging entity model (stg_entities.sql
    ``cleaned``/``deduplicated`` CTEs). ``raw_entities`` columns:
    article_id, entity_text, entity_type, start_char, end_char,
    confidence_score, extracted_at, created_at."""
    re_ = raw_entities.filter(
        F.col("entity_text").isNotNull()
        & (F.trim(F.col("entity_text")) != "")
        & F.col("entity_type").isNotNull()
        & (F.trim(F.col("entity_type")) != "")
        & F.col("confidence_score").isNotNull()
        & F.col("extracted_at").isNotNull()
        & F.col("created_at").isNotNull()
        & (F.col("confidence_score") >= 0.5)
    )
    # entity instances (large) join the per-article mapping (smaller but
    # still corpus-sized) — keyed equi-join, broadcast left to AQE
    joined = re_.join(
        mapping.select("raw_article_id", "staging_article_id"),
        re_["article_id"] == F.col("raw_article_id"),
    )
    conf = F.col("confidence_score").cast("double")
    cleaned = joined.select(
        dbt_surrogate_key(
            F.col("article_id"),
            F.col("entity_text"),
            F.col("entity_type"),
            F.col("start_char"),
        ).alias("entity_id"),
        F.col("staging_article_id").alias("out_article_id"),
        F.trim(F.col("entity_text")).alias("out_entity_text"),
        normalize_entity_type(F.col("entity_type")).alias("out_entity_type"),
        F.when(conf < 0, F.lit(0.0))
        .when(conf > 1, F.lit(1.0))
        .otherwise(conf)
        .alias("out_confidence"),
        F.coalesce(F.col("start_char"), F.lit(0)).alias("start_position"),
        F.coalesce(
            F.col("end_char"),
            F.col("start_char") + F.length(F.col("entity_text")),
            F.length(F.col("entity_text")),
        ).alias("end_position"),
        F.length(F.trim(F.col("entity_text"))).alias("entity_length"),
        F.col("extracted_at").cast("timestamp").alias("extracted_at_utc"),
        F.col("created_at").cast("timestamp").alias("created_at_utc"),
        # dedup natural key (raw article id + trimmed/uppered fields)
        F.col("article_id").alias("_raw_aid"),
        F.trim(F.col("entity_text")).alias("_k_text"),
        F.upper(F.trim(F.col("entity_type"))).alias("_k_type"),
        F.col("start_char").alias("_k_start"),
        F.col("extracted_at").alias("_o_ext"),
        F.col("created_at").alias("_o_cre"),
    )
    w = Window.partitionBy("_raw_aid", "_k_text", "_k_type", "_k_start").orderBy(
        F.desc("_o_ext"), F.desc("_o_cre")
    )
    return (
        cleaned.withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .select(
            "entity_id",
            F.col("out_article_id").alias("article_id"),
            F.col("out_entity_text").alias("entity_text"),
            F.col("out_entity_type").alias("entity_type"),
            F.col("out_confidence").alias("confidence_score"),
            "start_position",
            "end_position",
            "entity_length",
            "extracted_at_utc",
            "created_at_utc",
        )
    )
