"""Hand-computed oracles for semdedup, dsir_scores and block_stats_summary."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neuronews_spark.operators.blocking import block_stats_summary
from neuronews_spark.operators.dedup import semdedup
from neuronews_spark.operators.importance import dsir_scores


def _round_half_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def test_semdedup_greedy_lowest_id_wins(spark):
    # sign_bits=2 → cell = (v[0]>=0) + 2*(v[1]>=0)
    # cell 3 (+,+): a=(1,0,0), b=(1,0.01,0) ~ cos≈1 vs a → dropped;
    #              c=(0.01,1,0): cos(a,c)≈0.01 <t, cos(b,c)≈0.02 <t → kept
    # cell 0 (−,−): d=(-1,-1,0) singleton → kept, null prior
    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("b", [1.0, 0.01, 0.0]),
        ("c", [0.01, 1.0, 0.0]),
        ("d", [-1.0, -1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semdedup(
            df, "vec_id", "embedding", sign_bits=2, threshold=0.9
        ).collect()
    }
    assert out["a"]["keep"] and out["a"]["max_sim_prior"] is None
    assert not out["b"]["keep"] and out["b"]["max_sim_prior"] > 0.999
    assert out["c"]["keep"] and out["c"]["max_sim_prior"] < 0.1
    assert out["d"]["keep"] and out["d"]["max_sim_prior"] is None
    assert out["a"]["cell"] == 3 and out["d"]["cell"] == 0
    assert out["a"]["n_cell"] == 3 and out["d"]["n_cell"] == 1


def test_semdedup_drop_rule_ignores_dropped_status_of_prior(spark):
    # chain a~b≥t, b~c≥t, a~c≥t too here; the documented rule is
    # "any lower-id cell-mate", not "any KEPT lower-id cell-mate"
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [1.0, 0.05]),
        ("c", [1.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in semdedup(
            df, "vec_id", "embedding", sign_bits=2, threshold=0.99
        ).collect()
    }
    assert out == {"a": True, "b": False, "c": False}


def test_dsir_scores_hand_computed(spark):
    docs = spark.createDataFrame(
        [("d1", "en", "x x y"), ("d2", "de", "x z")],
        "doc_id string, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_scores(docs, F.col("lang") == "en").collect()
    }
    # vocab: x(a=3,t=2) y(a=1,t=1) z(a=1,t=0); A=5 T=3 V=3
    const = math.log(5 + 3) - math.log(3 + 3)
    w = {
        "x": _round_half_away(1e6 * (math.log(3) - math.log(4) + const)),
        "y": _round_half_away(1e6 * (math.log(2) - math.log(2) + const)),
        "z": _round_half_away(1e6 * (math.log(1) - math.log(2) + const)),
    }
    assert out["d1"]["n_tokens"] == 3
    assert out["d1"]["score_micro_nats"] == 2 * w["x"] + w["y"]
    assert out["d2"]["n_tokens"] == 2
    assert out["d2"]["score_micro_nats"] == w["x"] + w["z"]
    # the all-target-looking doc must outrank the one with the
    # target-absent token
    assert (
        out["d1"]["mean_micro_nats"] > out["d2"]["mean_micro_nats"]
    )


def test_block_stats_summary_families_and_pair_bill(spark):
    # family x: one block of 3 (3 pairs) + one singleton;
    # family m (minhash band key 'm0_…'): one block of 5 (10 pairs),
    # capped at cap=4 → excluded from capped_candidate_pairs
    keys = (
        ["x|T|alpha"] * 3
        + ["x|T|beta"]
        + ["m0_123_456|T"] * 5
    )
    blocks = spark.createDataFrame([(k,) for k in keys], "block_key string")
    out = {r["family"]: r for r in block_stats_summary(blocks, cap=4).collect()}
    x, m = out["x"], out["m"]
    assert x["n_blocks"] == 2 and x["n_vertex_rows"] == 4
    assert x["n_singletons"] == 1 and x["max_block_size"] == 3
    assert x["candidate_pairs"] == 3 and x["capped_blocks"] == 0
    assert x["capped_candidate_pairs"] == 3
    assert m["n_blocks"] == 1 and m["max_block_size"] == 5
    assert m["candidate_pairs"] == 10 and m["capped_blocks"] == 1
    assert m["capped_candidate_pairs"] == 0
