"""CSV / JSON / parquet batch source (reference
``batch_write_raw_with_lineage.py:88-114``): format detection ladder,
lossless scalar round-trips, explicit-schema reads, metadata stamp."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from neuronews_spark.sources.files import (
    detect_format,
    read_batch,
    with_batch_metadata,
)

ROWS = [
    (1, "alpha, with comma", 3.5),
    (2, 'quote " inside', -1.0),
    (3, None, 0.25),
]
SCHEMA = "id BIGINT, text STRING, score DOUBLE"


def test_detect_format_ladder():
    assert detect_format("/data/latest/part.csv") == "csv"
    assert detect_format("/data/latest/x.parquet") == "parquet"
    assert detect_format("s3://b/scraped/day.json") == "json"
    # glob fallback (the reference's second ladder rung)
    assert detect_format("data/scraped/latest/*.csv") == "csv"
    assert detect_format("data/scraped/latest/*.json") == "json"
    with pytest.raises(ValueError):
        detect_format("data/scraped/latest")


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet"])
def test_roundtrip_with_explicit_schema(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / f"batch.{fmt}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)
    back = read_batch(spark, path, schema=SCHEMA)
    assert back.schema == df.schema  # no inference drift
    assert sorted(back.collect()) == sorted(df.collect())


def test_csv_inference_fallback_matches_reference(spark, tmp_path):
    """Without a schema the reader behaves like the reference's
    ``spark.read.option('header', True).csv`` — all-string columns."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "infer.csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = read_batch(spark, path)
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "string",
        "string",
        "string",
    ]
    assert back.count() == 3


def test_fmt_override_beats_detection(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "actually_json.dat")
    df.write.mode("overwrite").json(path)
    back = read_batch(spark, path, fmt="json", schema=SCHEMA)
    assert back.count() == 3
    with pytest.raises(ValueError):
        read_batch(spark, path, fmt="avro")


def test_with_batch_metadata_stamp(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = with_batch_metadata(df, "BatchWriteRawWithLineage")
    assert out.columns == [
        "id",
        "text",
        "score",
        "batch_processed_at",
        "processing_job",
        "lineage_enabled",
    ]
    r = out.select(
        F.min("processing_job").alias("j"), F.min("lineage_enabled").alias("e")
    ).collect()[0]
    assert r["j"] == "BatchWriteRawWithLineage" and r["e"] is True


def test_committed_fixtures_are_regeneration_stable(tmp_path, monkeypatch):
    """The file_batch_docs oracle reads the committed fixture files, so
    regenerating them must be byte-identical — a drifting generator would
    silently decouple the Spark query from its DuckDB mirror."""
    import scripts.make_file_fixtures as gen

    monkeypatch.setattr(gen, "FIXDIR", str(tmp_path))
    gen.main()
    repo_fix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
    )
    for name in ("scraped_docs.csv", "scraped_docs.json"):
        with open(os.path.join(tmp_path, name), "rb") as a, open(
            os.path.join(repo_fix, name), "rb"
        ) as b:
            assert a.read() == b.read(), name
