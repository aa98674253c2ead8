"""Parse round-trip for the emitted Iceberg SQL strings.

The sandbox has no Iceberg runtime jar (the gated end-to-end exercise
lives in tests/test_integration_gated.py and needs a network-fetched
catalog), so the DDL/MERGE strings ``iceberg_ddl`` / ``iceberg_merge_sql``
emit were previously never executed anywhere. This pins them
syntactically with Spark's OWN SQL parser — the same ANTLR grammar a
real Iceberg-enabled session would feed them through — and asserts the
parsed logical-plan shape (CreateTable with the transform partitioning
and table properties; MergeIntoTable with both WHEN branches), so a
regression that breaks the emitted SQL fails without a catalog.
"""

from __future__ import annotations

import pytest

from neuronews_spark.sources.tables import iceberg_ddl, iceberg_merge_sql

SCHEMA_SQL = "id STRING, title STRING, body STRING, ts TIMESTAMP"


def _parse(spark, sql: str):
    """Run the statement through Spark's ANTLR SQL parser; raises
    ParseException (py4j error) on any syntax break."""
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_iceberg_ddl_parses_with_transform_partitioning(spark):
    sql = iceberg_ddl("cat.db.raw_articles", SCHEMA_SQL)
    plan = _parse(spark, sql)
    s = plan.toString()
    assert "CreateTable" in plan.getClass().getSimpleName(), s
    # the transform partition expression survives parsing as days(ts)
    assert "days" in s and "ts" in s, s
    # table properties reach the plan (not silently dropped by the grammar)
    for prop in (
        "write.format.default",
        "write.parquet.compression-codec",
        "write.distribution-mode",
    ):
        assert prop in s, f"missing table property {prop} in plan: {s}"


def test_iceberg_ddl_parses_with_custom_partition_expr(spark):
    plan = _parse(
        spark,
        iceberg_ddl("cat.db.ev", "id BIGINT, ts TIMESTAMP", "bucket(16, id)"),
    )
    s = plan.toString()
    assert "bucket" in s, s


def test_iceberg_merge_parses_with_both_branches(spark):
    sql = iceberg_merge_sql(
        "cat.db.raw_articles", "id", ["id", "title", "body", "ts"]
    )
    plan = _parse(spark, sql)
    assert plan.getClass().getSimpleName() == "MergeIntoTable", plan.toString()
    s = plan.toString().lower()
    # both WHEN branches present: matched UPDATE + not-matched INSERT
    assert "updateaction" in s, s
    assert "insertaction" in s, s
    # the key column never appears in the UPDATE SET list
    update_clause = sql.split("UPDATE SET")[1].split("WHEN NOT MATCHED")[0]
    assert "t.id = s.id" not in update_clause


def test_iceberg_merge_rejects_malformed(spark):
    """The parser actually rejects bad SQL — the assertion above is not
    vacuously passing a parser that accepts anything."""
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        _parse(spark, "MERGE INTO t USING ON WHEN THEN")
