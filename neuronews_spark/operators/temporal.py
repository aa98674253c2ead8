"""Temporal knowledge-graph queries over a timestamped edge-event table.

Re-hosts the reference's mutation-log queries
(``/root/reference/src/knowledge_graph/kg_updater.py:233-317``): the
updater records every added triple with a timestamp, and two query
helpers read the log — ``get_emerging_connections`` (triples added after
a cutoff, most recent ``limit``) and ``get_evolving_topics`` (entities
ranked by how many new MENTIONS edges they gained inside a window).

Spark shape: the mutation log is just an ``edge_events`` DataFrame
(subject_id, predicate, object_id, object_name, object_type, source_doc,
added_at) — the natural by-product of writing mention edges with event
time. Both queries are a partition-prunable time filter plus one
aggregation/top-k; on a date-partitioned lakehouse table the filter
reaches the scan (the reference's in-memory list scan becomes partition
pruning at scale).

As-of join and gap-based sessionization live here too (no reference
counterpart — the reference's timeline code orders and buckets events but
never joins two streams point-in-time; both are table-stakes for the
large-scale analytics/training pipelines this engine targets). Scale
notes (100 TB):
  * ``asof_join`` is the union+window formulation: ONE shuffle on the key,
    no per-key range join and no O(probe x build) candidate blow-up. Both
    inputs are tagged, unioned, sorted within each key by (ts, tag,
    tiebreak), and the last build payload is carried forward with
    ``last(..., ignorenulls=True)``. Skewed keys cost one sorted partition
    each (same bound as any window dedup); a range-partitioned variant
    (bucket by key + coarse time range) is the documented escalation path
    for keys whose history exceeds one task's memory.
  * ``sessionize`` is a lag + running-sum over the same single shuffle;
    the gap comparison is integer microseconds (``unix_micros``) so the
    DuckDB mirror (``epoch_us``) is bit-exact, no float-epoch hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def emerging_connections(
    edge_events: DataFrame,
    since_days: int = 7,
    limit: int = 50,
) -> DataFrame:
    """Edges added in the trailing ``since_days`` window (relative to the
    log's max event time — self-calibrating, so the query is a pure
    function of the table), most recent ``limit`` under the total order
    (added_at desc, source_doc desc, object_id desc).

    kg_updater.py:233-273 semantics: one row per new edge with subject,
    predicate, object identity + naming and provenance columns."""
    mx = edge_events.agg(F.max("added_at").alias("m")).first()["m"]
    cutoff = F.lit(mx) - F.expr(f"INTERVAL {since_days} DAYS")
    # orderBy + limit compiles to TakeOrderedAndProject (per-partition
    # top-k + driver merge) — no global sort, no single-partition window
    return (
        edge_events.filter(F.col("added_at") >= cutoff)
        .orderBy(F.desc("added_at"), F.desc("source_doc"), F.desc("object_id"))
        .limit(limit)
    )


def evolving_topics(
    edge_events: DataFrame,
    window_days: int = 30,
    top_n: int = 20,
) -> DataFrame:
    """Entities ranked by newly-gained MENTIONS edges inside the trailing
    window (kg_updater.py:275-317): (entity_id, name, type,
    new_connections, n_docs, source_docs) — top ``top_n`` by count with a
    deterministic entity-id tiebreak. ``source_docs`` is the sorted
    comma-joined doc list (the reference returns the sorted set)."""
    mx = edge_events.agg(F.max("added_at").alias("m")).first()["m"]
    cutoff = F.lit(mx) - F.expr(f"INTERVAL {window_days} DAYS")
    agg = (
        edge_events.filter(F.col("added_at") >= cutoff)
        .groupBy("object_id", "object_name", "object_type")
        .agg(
            F.count(F.lit(1)).alias("new_connections"),
            F.countDistinct("source_doc").alias("n_docs"),
            F.array_join(
                F.array_sort(F.collect_set("source_doc")), ","
            ).alias("source_docs"),
        )
    )
    # top-k via TakeOrderedAndProject, then rank the ≤top_n survivors
    # (the window spans only the tiny result set, not the full aggregate)
    top = agg.orderBy(F.desc("new_connections"), F.asc("object_id")).limit(top_n)
    w = Window.orderBy(F.desc("new_connections"), F.asc("object_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("object_id").alias("entity_id"),
            F.col("object_name").alias("name"),
            F.col("object_type").alias("type"),
            "new_connections",
            "n_docs",
            "source_docs",
            "rank",
        )
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    ts_col: str,
    payload_cols: list[str],
    tiebreak: str,
    prefix: str = "matched_",
) -> DataFrame:
    """For every probe row, attach the build row with the greatest
    ``ts_col`` <= the probe's ``ts_col`` within the same ``on`` key
    (left-outer: unmatched probes keep nulls).

    Build rows sharing (key, ts) are disambiguated by ``tiebreak``
    (greatest wins) so the result is deterministic under any input order.
    Output = all probe columns + ``prefix + ts_col`` + ``prefix + c`` for
    each payload column.
    """
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in payload_cols]
    )
    b = build.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tb"),
        payload.alias("_build"),
    )
    probe_cols = probe.columns
    # the probe row travels as one typed struct so arbitrary probe schemas
    # survive the union without column-by-column schema alignment
    p = probe.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.col(tiebreak).alias("_tb"),
        F.lit(None).cast(b.schema["_build"].dataType).alias("_build"),
        F.struct(*[F.col(c).alias(c) for c in probe_cols]).alias("_row"),
    )
    b = b.withColumn("_row", F.lit(None).cast(p.schema["_row"].dataType))
    u = b.unionByName(p)
    # build rows (_tag 0) sort before probe rows at equal ts -> ">=" match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_build", ignorenulls=True).over(w)
    return u.withColumn("_m", matched).filter(F.col("_tag") == 1).select(
        *[F.col("_row")[c].alias(c) for c in probe_cols],
        F.col("_m")[ts_col].alias(prefix + ts_col),
        *[F.col("_m")[c].alias(prefix + c) for c in payload_cols],
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str,
) -> DataFrame:
    """Assign 1-based ``session_seq`` per key: a new session starts when
    the gap to the previous event (ordered by ts, tiebreak) exceeds
    ``gap_seconds``. Adds the column; one shuffle on ``key``."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > F.lit(int(gap_seconds) * 1_000_000)), 1
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str,
    value_col: str,
) -> DataFrame:
    """Per-session aggregate over ``sessionize``: event count, start/end,
    and the value sum in exact integer cents (``round(v*100)::bigint``
    before summing — float-sum-order safe across engines)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        sessionize(df, key, ts_col, gap_seconds, tiebreak)
        .groupBy(key, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.sum(cents).alias("sum_value_cents"),
        )
    )


def funnel_stage_times(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    tiebreak: str,
) -> DataFrame:
    """Ordered-funnel per key: stage i counts only at-or-after the first
    qualifying occurrence of stage i-1 (the windowFunnel operator of
    event-analytics engines). Returns one row per key with
    ``t_<stage>`` = first qualifying timestamp (null = never reached).

    One shuffle on ``key``; every stage is a running conditional min over
    the SAME sorted window, so the sort is paid once regardless of the
    number of stages. Scale note: no arrays are collected — state per row
    is ``len(stages)`` columns.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    prev: str | None = None
    for stage in stages:
        qualifies = F.col(type_col) == stage
        if prev is not None:
            # the running min for the previous stage is ≤ current ts by
            # construction of the ordered window, so non-null == reached
            qualifies = qualifies & F.col(f"t_{prev}").isNotNull()
        out = out.withColumn(
            f"t_{stage}",
            F.min(F.when(qualifies, F.col(ts_col))).over(w),
        )
        prev = stage
    return out.groupBy(key).agg(
        *[F.max(f"t_{s}").alias(f"t_{s}") for s in stages]
    )


def funnel_counts(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    tiebreak: str,
) -> DataFrame:
    """Funnel rollup over :func:`funnel_stage_times`: one row per stage
    (ordinal, stage, n_reached, conversion vs previous stage rounded to
    6). Stage rows are produced by an in-plan stack (no driver loop)."""
    per_key = funnel_stage_times(df, key, ts_col, type_col, stages, tiebreak)
    counts = per_key.agg(
        *[
            F.count(F.col(f"t_{s}")).alias(f"n_{i}")
            for i, s in enumerate(stages)
        ]
    )
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("ordinal"),
                F.lit(s).alias("stage"),
                F.col(f"n_{i}").alias("n_reached"),
                (
                    F.round(
                        F.col(f"n_{i}")
                        / F.nullif(F.col(f"n_{i - 1}"), F.lit(0)),
                        6,
                    )
                    if i > 0
                    else F.lit(1.0)
                ).alias("conversion"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(stage_rows).alias("r")).select("r.*")
