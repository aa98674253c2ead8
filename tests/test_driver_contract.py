"""Local replica of the driver's correctness gate: every query in
``__spark_entry__.queries()`` with an ``oracle_sql()`` entry must match
DuckDB row-for-row (columns sorted by name, order-insensitive) at sf0.001;
rows-only queries must at least run and return a stable schema."""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _row_key(row):
    # null-safe total order (None < everything, then by string form) —
    # both sides sort by the same key, so the zip-compare stays valid for
    # nullable columns (e.g. the unmatched side of a left as-of join)
    return tuple((v is not None, str(v)) for v in row)


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_row_key
    ), cols


def _duck_rows(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    idx = sorted(range(len(names)), key=lambda i: names[i])
    rows = sorted(
        (tuple(_norm(row[i]) for i in idx) for row in cur.fetchall()),
        key=_row_key,
    )
    return rows, sorted(names)


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_duckdb_oracle(spark, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_rows, s_cols = _spark_rows(sdf)
    d_rows, d_cols = _duck_rows(entrymod.oracle_sql()[name])
    assert s_cols == d_cols, (name, s_cols, d_cols)
    assert len(s_rows) == len(d_rows), (name, len(s_rows), len(d_rows))
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ][:5]
    assert not mismatches, (name, mismatches)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) >= {"entity_id", "entity_type", "name"}
