"""Salted skew-mitigation operators (operators/skew.py): result equality
vs the unsalted plans, and physical-plan proof that the salt actually
spreads the hot key across the first exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neuronews_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark, n=2000):
    # 90% of rows on key 'hot'
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 9, "hot")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") % 100).cast("long").alias("cents"),
    )


def test_salted_aggregate_equals_plain_groupby(spark):
    df = _skewed(spark)
    got = {
        r["k"]: r
        for r in salted_aggregate(
            df,
            keys=["k"],
            specs=[
                ("count", "event_id", "n"),
                ("sum", "cents", "s"),
                ("min", "event_id", "lo"),
                ("max", "event_id", "hi"),
            ],
            salt_src="event_id",
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        for c in ("n", "s", "lo", "hi"):
            assert got[k][c] == want[k][c], (k, c)


def test_salted_aggregate_first_exchange_partitions_on_salt(spark):
    df = _skewed(spark)
    plan = salted_aggregate(
        df, ["k"], [("count", "event_id", "n")], "event_id", 8
    )._jdf.queryExecution().executedPlan().toString()
    # stage-1 exchange must hash on (k, _salt); stage-2 on k alone
    # (toString prints top-down, so stage-2 appears first)
    import re

    parts = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert len(parts) == 2, plan
    assert "_salt" in parts[1] and "_salt" not in parts[0], parts


def test_salted_aggregate_rejects_non_algebraic(spark):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(
            _skewed(spark), ["k"], [("avg", "cents", "a")], "event_id"
        )


def test_salted_join_equals_plain_join(spark):
    probe = _skewed(spark, 500)
    build = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3)], "k string, tag int"
    )
    got = sorted(
        (r["event_id"], r["tag"])
        for r in salted_join(
            probe, build, on="k", salt_src="event_id",
            n_salts=4, force_shuffle=True,
        ).collect()
    )
    want = sorted(
        (r["event_id"], r["tag"]) for r in probe.join(build, "k").collect()
    )
    assert got == want and len(got) > 0


def test_salted_join_left_keeps_unmatched(spark):
    probe = _skewed(spark, 100)
    build = spark.createDataFrame([("hot", 1)], "k string, tag int")
    rows = salted_join(
        probe, build, on="k", salt_src="event_id", n_salts=4, how="left"
    ).collect()
    assert len(rows) == 100
    assert sum(1 for r in rows if r["tag"] is None) == 10  # the k* keys
