"""Entity corrections workflow — port of the reference's behavioral suite
(tests/knowledge_graph/test_entity_corrections.py): submission versioning
+ validation, approve/reject state machine, and all six correction types
applied to distributed nodes/edges tables."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from neuronews_spark.operators.corrections import (
    CorrectionLog,
    apply_corrections,
)


def _nodes(spark, rows):
    return spark.createDataFrame(
        rows,
        "node_id string, name string, aliases array<string>, "
        "properties map<string,string>",
    )


def _collect(nodes):
    return {r["node_id"]: r for r in nodes.collect()}


# ---------------------------------------------------------- submission

def test_submit_returns_pending_with_monotonic_versions():
    log = CorrectionLog()
    c1 = log.submit("e1", "rename", {"new_name": "Name One"})
    c2 = log.submit("e1", "rename", {"new_name": "Name Two"})
    c3 = log.submit("e2", "rename", {"new_name": "Other"})
    assert c1.status == "pending"
    assert c2.version == c1.version + 1
    assert c3.version == 1  # versions independent per entity
    assert len({c1.correction_id, c2.correction_id, c3.correction_id}) == 3


def test_missing_payload_raises():
    log = CorrectionLog()
    with pytest.raises(ValueError, match="requires payload keys"):
        log.submit("e1", "rename", {})
    with pytest.raises(ValueError, match="requires payload keys"):
        log.submit("e1", "add_property", {"key": "k"})  # value missing


def test_to_dict_serialisable():
    log = CorrectionLog()
    c = log.submit("e1", "rename", {"new_name": "X"}, submitted_by="user-42")
    assert json.dumps(c.to_dict())
    assert c.to_dict()["status"] == "pending"


# ------------------------------------------------------------- review

def test_review_state_machine():
    log = CorrectionLog()
    c = log.submit("e1", "rename", {"new_name": "X"})
    log.approve(c.correction_id, reviewed_by="admin-1", review_note="confirmed")
    assert c.status == "approved" and c.reviewed_by == "admin-1"
    assert c.review_note == "confirmed"
    with pytest.raises(ValueError, match="already approved"):
        log.approve(c.correction_id, reviewed_by="admin-2")
    c2 = log.submit("e1", "rename", {"new_name": "Y"})
    log.reject(c2.correction_id, reviewed_by="admin-1", review_note="not correct")
    assert c2.status == "rejected"
    with pytest.raises(ValueError, match="already rejected"):
        log.reject(c2.correction_id, reviewed_by="admin-2")
    with pytest.raises(KeyError):
        log.approve("no-such-id", reviewed_by="admin")


def test_list_by_status_and_entity():
    log = CorrectionLog()
    c1 = log.submit("e1", "rename", {"new_name": "Alice Smith"})
    log.submit("e2", "rename", {"new_name": "Robert"})
    log.approve(c1.correction_id, reviewed_by="admin")
    assert len(log.list_corrections(status="pending")) == 1
    assert len(log.list_corrections(status="approved")) == 1
    assert all(c.entity_id == "e1" for c in log.list_corrections(entity_id="e1"))
    assert log.get(c1.correction_id) is not None
    assert log.get("no-such-id") is None


# ----------------------------------------------------- application types

def test_rename_and_rejected_not_applied(spark):
    nodes = _nodes(spark, [("e1", "Jeff Bezos", [], {})])
    log = CorrectionLog()
    c = log.submit("e1", "rename", {"new_name": "Jeffrey Preston Bezos"})
    log.approve(c.correction_id, reviewed_by="admin")
    r = log.submit("e1", "rename", {"new_name": "Wrong Name"})
    log.reject(r.correction_id, reviewed_by="admin")
    out, _ = apply_corrections(nodes, log)
    assert _collect(out)["e1"]["name"] == "Jeffrey Preston Bezos"


def test_alias_add_remove_idempotent(spark):
    nodes = _nodes(spark, [("a", "Apple", ["Apple Inc"], {}), ("t", "Tesla", [], {})])
    log = CorrectionLog()
    log.approve(log.submit("t", "add_alias", {"alias": "Tesla Inc"}).correction_id, "admin")
    log.approve(log.submit("t", "add_alias", {"alias": "Tesla Inc"}).correction_id, "admin")
    log.approve(log.submit("a", "remove_alias", {"alias": "Apple Inc"}).correction_id, "admin")
    out, _ = apply_corrections(nodes, log)
    got = _collect(out)
    assert got["t"]["aliases"].count("Tesla Inc") == 1
    assert "Apple Inc" not in got["a"]["aliases"]


def test_property_add_remove(spark):
    nodes = _nodes(spark, [("e", "Elon Musk", [], {"role": "CEO", "x": "1"})])
    log = CorrectionLog()
    log.approve(log.submit("e", "add_property", {"key": "role", "value": "CTO"}).correction_id, "admin")
    log.approve(log.submit("e", "remove_property", {"key": "x"}).correction_id, "admin")
    log.approve(log.submit("e", "remove_property", {"key": "does_not_exist"}).correction_id, "admin")
    out, _ = apply_corrections(nodes, log)
    props = _collect(out)["e"]["properties"]
    assert props == {"role": "CTO"}


def test_merge_absorbs_source_and_rewrites_edges(spark):
    nodes = _nodes(
        spark,
        [
            ("g", "Google", [], {"hq": "MV"}),
            ("al", "Alphabet", ["Alphabet Inc"], {"hq": "ELSEWHERE", "founded": "2015"}),
            ("x", "Other", [], {}),
        ],
    )
    edges = spark.createDataFrame(
        [("al", "PARTNERS_WITH", "x"), ("x", "MENTIONS", "al"), ("g", "MENTIONS", "al")],
        "subject string, predicate string, object string",
    )
    log = CorrectionLog()
    log.approve(log.submit("g", "merge", {"merge_from": "al"}).correction_id, "admin")
    out, e_out = apply_corrections(nodes, log, edges)
    got = _collect(out)
    assert "al" not in got  # source removed
    g = got["g"]
    assert "Alphabet" in g["aliases"] and "Alphabet Inc" in g["aliases"]
    assert g["properties"]["hq"] == "MV"         # target wins conflicts
    assert g["properties"]["founded"] == "2015"  # source fills gaps
    erows = {(r["subject"], r["predicate"], r["object"]) for r in e_out.collect()}
    assert ("g", "PARTNERS_WITH", "x") in erows
    assert ("x", "MENTIONS", "g") in erows
    # g MENTIONS al becomes a self-loop → dropped
    assert not any(s == o for s, _, o in erows)


def test_chained_merges_follow_final_target(spark):
    nodes = _nodes(
        spark, [("a", "A", [], {}), ("b", "B", [], {}), ("c", "C", [], {})]
    )
    log = CorrectionLog()
    log.approve(log.submit("a", "merge", {"merge_from": "b"}).correction_id, "admin")
    log.approve(log.submit("c", "merge", {"merge_from": "a"}).correction_id, "admin")
    out, _ = apply_corrections(nodes, log)
    got = _collect(out)
    assert set(got) == {"c"}
    assert {"A", "B"} <= set(got["c"]["aliases"])


def test_random_streams_match_sequential_replay(spark):
    """Property: for random submit/approve/reject streams, the distributed
    consolidate-and-join apply equals a simple sequential implementation
    of the documented PHASE contract (field ops in submission order on
    their submitted ids, then chained merges) — guarding the broadcast-
    join plumbing against a dict-based single-machine reference."""
    import random

    rng = random.Random(1234)
    ids = ["a", "b", "c", "d"]
    for trial in range(4):
        nodes = {
            i: {"name": f"N{i}", "aliases": [f"al_{i}"], "props": {"k0": i}}
            for i in ids
        }
        log = CorrectionLog()
        ops = []
        for _ in range(rng.randint(4, 14)):
            e = rng.choice(list(nodes))
            kind = rng.choice(
                ["rename", "add_alias", "remove_alias",
                 "add_property", "remove_property", "merge"]
            )
            if kind == "rename":
                payload = {"new_name": f"R{rng.randint(0, 9)}"}
            elif kind in ("add_alias", "remove_alias"):
                payload = {"alias": f"al_{rng.randint(0, 5)}"}
            elif kind == "add_property":
                payload = {"key": f"k{rng.randint(0, 2)}", "value": str(rng.randint(0, 9))}
            elif kind == "remove_property":
                payload = {"key": f"k{rng.randint(0, 2)}"}
            else:
                src = rng.choice([i for i in ids if i != e])
                payload = {"merge_from": src}
            c = log.submit(e, kind, payload)
            approved = rng.random() < 0.8
            if approved:
                log.approve(c.correction_id, "admin")
            else:
                log.reject(c.correction_id, "admin")
            if approved:
                ops.append((e, kind, payload))

        # sequential implementation of the PHASE contract
        store = {
            i: {"name": v["name"], "aliases": list(v["aliases"]),
                "props": {k: str(x) for k, x in v["props"].items()}}
            for i, v in nodes.items()
        }
        # phase 1: field ops on their submitted ids, in order
        for e, kind, payload in ops:
            if kind == "merge":
                continue
            n = store[e]
            if kind == "rename":
                n["name"] = payload["new_name"]
            elif kind == "add_alias":
                if payload["alias"] not in n["aliases"]:
                    n["aliases"].append(payload["alias"])
            elif kind == "remove_alias":
                if payload["alias"] in n["aliases"]:
                    n["aliases"].remove(payload["alias"])
            elif kind == "add_property":
                n["props"][payload["key"]] = payload["value"]
            elif kind == "remove_property":
                n["props"].pop(payload["key"], None)
        # phase 2: merges chained to final targets
        final: dict[str, str] = {}
        for e, kind, payload in ops:
            if kind != "merge":
                continue
            t, s = final.get(e, e), payload["merge_from"]
            for k, v in list(final.items()):
                if v == s:
                    final[k] = t
            final[s] = t
        # drop self-redirects that chaining may have created
        final = {s: t for s, t in final.items() if s != t}
        # absorb: group sources by final target, deterministic source order
        by_target: dict[str, list[str]] = {}
        for s, t in final.items():
            by_target.setdefault(t, []).append(s)
        for t, sources in by_target.items():
            tn = store[t]
            pool = list(tn["aliases"])
            for s in sorted(sources):
                sn = store.pop(s)
                pool.extend(sn["aliases"])
                pool.append(sn["name"])
                for k, v in sn["props"].items():
                    tn["props"].setdefault(k, v)
            seen = []
            for al in pool:
                if al not in seen and al != tn["name"]:
                    seen.append(al)
            tn["aliases"] = seen

        ndf = _nodes(
            spark,
            [(i, v["name"], v["aliases"], {k: str(x) for k, x in v["props"].items()})
             for i, v in nodes.items()],
        )
        out, _ = apply_corrections(ndf, log)
        got = {
            r["node_id"]: (r["name"], sorted(r["aliases"]), dict(r["properties"]))
            for r in out.collect()
        }
        want = {
            i: (v["name"], sorted(v["aliases"]), dict(v["props"]))
            for i, v in store.items()
        }
        assert got == want, (trial, got, want)
