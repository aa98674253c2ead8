"""Dataset-builder tests (build_am_dataset.py:677-932 semantics):
instantiation fills, per-text cap, hash split fractions, annotator
simulation, Cohen's κ vs sklearn-formula kernel, Spark differential."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from neuronews_spark.operators.dataset_builder import (
    MAX_PER_TEXT,
    STANCE_LABELS,
    TEMPLATES,
    assign_split,
    assign_split_py,
    cap_per_text,
    cohen_kappa,
    cohen_kappa_py,
    instantiate,
    instantiate_py,
    second_annotator,
    second_annotator_py,
)


def test_instantiation_fills_all_placeholders():
    for eid in range(300):
        ex = instantiate_py(eid)
        assert "{" not in ex["text"] and "}" not in ex["text"], ex["text"]
        tmpl = TEMPLATES[[t[0] for t in TEMPLATES].index(
            next(t[0] for t in TEMPLATES if _matches(ex["text"], t[0]))
        )]
        assert ex["is_claim"] == tmpl[1] and ex["stance"] == tmpl[2]


def _matches(text: str, template: str) -> bool:
    pat = "^" + re.escape(template) + "$"
    pat = re.sub(r"\\\{\w+\\\}", ".+?", pat)
    return re.match(pat, text) is not None


def test_split_fractions_and_determinism():
    splits = [assign_split_py(i) for i in range(10_000)]
    frac = {s: splits.count(s) / 10_000 for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.70) < 0.03
    assert abs(frac["val"] - 0.15) < 0.02
    assert abs(frac["test"] - 0.15) < 0.02
    assert splits[:100] == [assign_split_py(i) for i in range(100)]  # replayable


def test_annotator_agreement_rate():
    n = 5000
    agree = sum(
        1
        for i in range(n)
        if second_annotator_py("neutral", i, STANCE_LABELS, 84) == "neutral"
    )
    assert abs(agree / n - 0.84) < 0.02
    # disagreements are always a *different* label from the set
    for i in range(500):
        lbl = second_annotator_py("neutral", i, STANCE_LABELS, 0)
        assert lbl in STANCE_LABELS and lbl != "neutral"


def test_kappa_kernel_properties():
    # perfect agreement → κ = 1; independent marginals → κ ≈ 0
    assert cohen_kappa_py([("a", "a")] * 10 + [("b", "b")] * 10) == 1.0
    mixed = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 25
    assert abs(cohen_kappa_py(mixed)) < 1e-9


def test_spark_matches_kernel(spark):
    df = spark.range(400).select(F.col("id").alias("ex_id"))
    ds = cap_per_text(instantiate(df)).withColumn(
        "split", assign_split(F.col("ex_id"))
    )
    got = {
        r["ex_id"]: (r["text"], r["is_claim"], r["stance"], r["frames"],
                     r["topic"], r["split"])
        for r in ds.collect()
    }
    cnt: dict[str, int] = {}
    exp = {}
    for i in range(400):
        ex = instantiate_py(i)
        cnt[ex["text"]] = cnt.get(ex["text"], 0) + 1
        if cnt[ex["text"]] <= MAX_PER_TEXT:
            exp[i] = (ex["text"], ex["is_claim"], ex["stance"], ex["frames"],
                      ex["topic"], assign_split_py(i))
    assert got == exp and len(exp) > 100

    pairs = ds.select(
        F.col("stance").alias("a1"),
        second_annotator(F.col("stance"), F.col("ex_id"), STANCE_LABELS, 84).alias(
            "a2"
        ),
    )
    row = cohen_kappa(pairs, "a1", "a2").collect()[0]
    kernel = cohen_kappa_py(
        [(r["a1"], r["a2"]) for r in pairs.collect()]
    )
    assert row["kappa"] == round(kernel, 6)


def test_classification_report_confusion_math(spark):
    """model_benchmarks.md gate: confusion cells, zero-division
    conventions, and the f1-from-rounded-p/r convention."""
    from neuronews_spark.evaluation import classification_report

    rows = [
        ("news", 1, 1), ("news", 1, 1), ("news", 1, 0), ("news", 0, 1),
        ("news", 0, 0),
        ("blog", 1, 0), ("blog", 1, 0),  # blog never predicts 1
    ]
    df = spark.createDataFrame(rows, "source_type string, label int, pred int")
    out = {
        (r["source_type"], r["class"]): r.asDict()
        for r in classification_report(
            df, "label", "pred", "source_type"
        ).collect()
    }
    n1 = out[("news", "1")]
    assert (n1["tp"], n1["fp"], n1["fn"], n1["support"]) == (2, 1, 1, 3)
    assert n1["precision"] == round(2 / 3, 6) and n1["recall"] == round(2 / 3, 6)
    p = round(2 / 3, 6)
    assert n1["f1"] == round(2 * p * p / (p + p), 6)
    # blog class '1': predicted never -> precision 0 (zero-division), f1 0
    b1 = out[("blog", "1")]
    assert b1["precision"] == 0.0 and b1["recall"] == 0.0 and b1["f1"] == 0.0
    assert b1["passes"] is False
    # blog class '0': label never 0 -> support 0, recall 0
    b0 = out[("blog", "0")]
    assert b0["support"] == 0 and b0["fp"] == 2 and b0["recall"] == 0.0
