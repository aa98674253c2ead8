"""HLL++ approx-distinct gate: measured error vs exact, per corpus.

The driver query's oracle pins only the boolean envelope (within_tol);
this test records the actual measured relative errors so the envelope is
evidence-backed, and pins determinism (two runs, same estimates).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf", [s for s in SFS if os.path.isdir(s)])
def test_hll_error_within_envelope(spark, sf):
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert rows
    errs = {
        r["event_type"]: abs(r["approx"] - r["exact"]) / r["exact"] for r in rows
    }
    # 3x the requested rsd — the driver query's within_tol envelope
    assert max(errs.values()) <= 0.15, errs


def test_hll_estimate_is_deterministic(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 997).alias("k"), (F.col("id") % 7).alias("g")
    )
    a = sorted(
        (r["g"], r["a"])
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("k", rsd=0.05).alias("a"))
        .collect()
    )
    b = sorted(
        (r["g"], r["a"])
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("k", rsd=0.05).alias("a"))
        .collect()
    )
    assert a == b
