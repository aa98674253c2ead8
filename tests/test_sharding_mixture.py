"""Hand-computed oracles for deterministic_shuffle and mixture_weights."""

from __future__ import annotations

import hashlib

from neuronews_spark.operators.importance import mixture_weights
from neuronews_spark.operators.sharding import deterministic_shuffle


def _md5(seed: int, doc_id: str) -> str:
    return hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()


def test_deterministic_shuffle_matches_hand_hash_and_is_stable(spark):
    ids = [f"d{i}" for i in range(40)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    out = deterministic_shuffle(df, "doc_id", n_shards=4, seed=17)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 40

    # hand-compute shard + in-shard order from hashlib
    expect: dict[int, list[tuple[str, str]]] = {}
    for i in ids:
        k = _md5(17, i)
        shard = int(k[:8], 16) % 4
        expect.setdefault(shard, []).append((k, i))
    for shard, members in expect.items():
        members.sort()
        for pos, (k, i) in enumerate(members, start=1):
            assert rows[i]["shard"] == shard
            assert rows[i]["pos"] == pos
            assert rows[i]["shuffle_key"] == k

    # stable: a second evaluation returns identical rows
    again = {r["doc_id"]: r for r in out.collect()}
    assert all(
        (rows[i]["shard"], rows[i]["pos"]) == (again[i]["shard"], again[i]["pos"])
        for i in ids
    )

    # pos is dense 1..k within each shard
    by_shard: dict[int, set[int]] = {}
    for r in rows.values():
        by_shard.setdefault(r["shard"], set()).add(r["pos"])
    for shard, poss in by_shard.items():
        assert poss == set(range(1, len(poss) + 1))


def test_deterministic_shuffle_seed_changes_order(spark):
    ids = [(f"d{i}",) for i in range(40)]
    df = spark.createDataFrame(ids, "doc_id string")
    a = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in deterministic_shuffle(df, "doc_id", 4, seed=17).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in deterministic_shuffle(df, "doc_id", 4, seed=18).collect()
    }
    assert a != b


def test_mixture_weights_hand_computed(spark):
    rows = [("s1",)] * 1 + [("s2",)] * 3
    df = spark.createDataFrame(rows, "source string")
    out = {r["source"]: r for r in mixture_weights(df, "source", alpha=0.5).collect()}
    assert out["s1"]["n_docs"] == 1 and out["s2"]["n_docs"] == 3
    assert out["s1"]["share"] == 0.25 and out["s2"]["share"] == 0.75
    assert out["s2"]["w_rel"] == 1.0
    assert abs(out["s1"]["w_rel"] - round((1 / 3) ** 0.5, 6)) < 1e-12
