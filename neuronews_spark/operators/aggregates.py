"""Reference analytic aggregates re-expressed as DataFrame ops — each maps
1:1 to an entry in ``__spark_entry__.queries()`` with a DuckDB oracle.

Ports (semantics, with file:line into /root/reference):
  dim_entity            dbt/neuro_news/models/marts/dim_entity.sql:11-44
  latest_per_key        dbt staging window dedup, stg_entities.sql:80-121
  duplicate_audit       upsert_enriched.py:209-227
  trend_moving_avg      sentiment_trend_analyzer.py:449-535 (7-period MA)
  top_k_per_group       keyword_topic_extractor.py top-k / graph top-N
  cooccurrence_pairs    enhanced_entity_extractor.py:643-686 distance-banded
                        same-doc pair join with distance-decayed confidence
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_entity(mentions: DataFrame) -> DataFrame:
    """GROUP BY (text, type): avg confidence, mention count, first/last seen
    + CASE category (dim_entity.sql:11-44 shape)."""
    cat = (
        F.when(F.col("entity_type") == "Person", "people")
        .when(F.col("entity_type") == "Organization", "organizations")
        .otherwise(F.lit("topics"))
    )
    return (
        mentions.groupBy(
            F.col("name").alias("entity_text"),
            F.col("entity_type").alias("entity_type"),
        )
        .agg(
            F.round(F.avg("confidence"), 6).alias("avg_confidence"),
            F.count(F.lit(1)).alias("mention_count"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .withColumn("category", cat)
    )


def latest_per_key(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: str
) -> DataFrame:
    """row_number() over (partition by keys order by order desc, tiebreak
    desc) = 1 — the staging dedup (stg_entities.sql:80-121)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc(tiebreak))
    return (
        df.withColumn("row_num", F.row_number().over(w))
        .filter(F.col("row_num") == 1)
        .drop("row_num")
    )


def duplicate_audit(df: DataFrame, key: str) -> DataFrame:
    """GROUP BY key HAVING count(*) > 1 (upsert_enriched.py:209-227)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def trend_moving_avg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str | None = None,
    periods: int = 7,
) -> DataFrame:
    """Daily buckets + (periods)-day trailing moving average
    (sentiment_trend_analyzer.py:127-134 semantics)."""
    keys = [group_col] if group_col else []
    daily = events.groupBy(
        *keys, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(
        F.round(F.avg(value_col), 6).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(-(periods - 1), 0)
    )
    return daily.withColumn(
        "moving_avg", F.round(F.avg("avg_value").over(w), 6)
    )


def top_k_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak: str
) -> DataFrame:
    """Window rank ≤ k per group with a deterministic tiebreak."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cooccurrence_pairs(
    df: DataFrame,
    doc_col: str,
    id_col: str,
    pos_col: str,
    max_distance: float = 200.0,
) -> DataFrame:
    """Same-document pair join with |pos_a - pos_b| ≤ max_distance and
    distance-decayed strength ``1 - d/max_distance``
    (enhanced_entity_extractor.py:643-686; simpler variant
    nlp_populator.py:304-357 uses conf·(1-d/200)).

    Spark shape: equi-join on the document key (shuffle once on doc) +
    range predicate — Catalyst cannot avoid the within-doc quadratic, but
    the doc key bounds it; AQE splits skewed documents."""
    a = df.select(
        F.col(doc_col).alias("doc"),
        F.col(id_col).alias("id_a"),
        F.col(pos_col).alias("pos_a"),
    )
    b = df.select(
        F.col(doc_col).alias("doc"),
        F.col(id_col).alias("id_b"),
        F.col(pos_col).alias("pos_b"),
    )
    d = F.abs(F.col("pos_a") - F.col("pos_b"))
    return (
        a.join(b, "doc")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d <= max_distance)
        .select(
            "doc",
            "id_a",
            "id_b",
            F.round(d, 6).alias("distance"),
            F.round(F.lit(1.0) - d / F.lit(max_distance), 6).alias("strength"),
        )
    )
