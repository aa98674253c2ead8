"""PII redaction kernel (operators/pii.py) — hand-computed cases.

The driver query ``pii_redaction`` is the DuckDB-oracled end-to-end check
(same regexes via RE2); these tests pin the semantics the mirror can't
express as crisply: boundary anchoring, overlap disjointness, and
count/replace independence.
"""

from __future__ import annotations

from neuronews_spark.operators.pii import redact_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    return {r["doc_id"]: r for r in redact_pii(df, "text").collect()}


def test_each_type_detected_and_tagged(spark):
    got = _run(
        spark,
        ["reach a.b+c@ex-ample.co.uk or 555-123-4567; ssn 123-45-6789 ip 10.0.255.3"],
    )[0]
    assert (got["n_email"], got["n_ssn"], got["n_phone"], got["n_ip"]) == (1, 1, 1, 1)
    assert got["redacted"] == "reach <EMAIL> or <PHONE>; ssn <SSN> ip <IP>"


def test_ssn_and_phone_shapes_are_disjoint(spark):
    # a phone never half-matches the SSN pattern and vice versa
    got = _run(spark, ["call 555-123-4567", "ssn 123-45-6789"])
    assert (got[0]["n_phone"], got[0]["n_ssn"]) == (1, 0)
    assert (got[1]["n_phone"], got[1]["n_ssn"]) == (0, 1)


def test_word_boundaries_reject_embedded_runs(spark):
    # longer digit runs around the shape must not match (\b anchors)
    got = _run(spark, ["x1555-123-45678 and 9123-45-6789", "v1.2.3.4.5"])
    assert got[0]["n_phone"] == 0 and got[0]["n_ssn"] == 0
    # 1.2.3.4.5: the 4-octet prefix ends before '.5' — '.' is a word
    # boundary, so the conservative pattern does match the prefix; this is
    # the documented over-match of \b-anchored IPv4 (flagging is safe)
    assert got[1]["n_ip"] == 1


def test_counts_taken_on_original_text(spark):
    # two emails collapse to two tags; counts reflect the original
    got = _run(spark, ["x@y.io then z@w.ai"])[0]
    assert got["n_email"] == 2
    assert got["redacted"] == "<EMAIL> then <EMAIL>"


def test_clean_text_passes_through(spark):
    text = "no pii here 1234 2.3 a@b half-match 12-34"
    got = _run(spark, [text])[0]
    assert (got["n_email"], got["n_ssn"], got["n_phone"], got["n_ip"]) == (0, 0, 0, 0)
    assert got["redacted"] == text
