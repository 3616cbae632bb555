"""Driver-contract conformance: every ``queries()`` entry runs at sf0.01 and,
when an ``oracle_sql()`` entry exists, matches DuckDB on row count, column
names, and order-insensitive values — a local replica of the driver's gate.
"""

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rows_to_set(rows, cols):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES), ids=str)
def test_query_contract(spark, ddb, name):
    q = QUERIES[name]
    df = q(spark, SF_DIR)
    spark_rows = df.collect()
    cols = df.columns
    if name not in ORACLES:
        assert spark_rows is not None  # rows-only check (approximate ops)
        return
    res = ddb.execute(ORACLES[name])
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()
    assert sorted(cols) == sorted(oracle_cols), (
        f"{name}: spark cols {cols} vs oracle {oracle_cols}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: {len(spark_rows)} rows vs oracle {len(oracle_rows)}"
    )
    got = _rows_to_set([r.asDict() for r in spark_rows], sorted(cols))
    exp = _rows_to_set(
        [dict(zip(oracle_cols, r)) for r in oracle_rows], sorted(cols)
    )
    mismatches = [
        (g, e) for g, e in zip(got, exp) if g != e
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
