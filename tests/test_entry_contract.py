"""Mini-driver: replicate the correctness gate locally at sf0.001.

For every entry in ``queries()`` with an oracle, run the Spark plan and
the DuckDB SQL on the same parquet tables and compare row count, column
names/types, and order-insensitive values — so mismatches surface here
before the real driver runs at sf0.01.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("POLAR_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / representation noise at the comparison layer
        return round(v, 9)
    return v


def _rows_canon(rows):
    return sorted((tuple(_canon(v) for v in r) for r in rows), key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()

    assert scols == dcols, f"{name}: column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc, dc = _rows_canon(srows), _rows_canon(drows)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


# every registered query now carries a SQL oracle
ROWS_ONLY: set[str] = set()


def test_all_queries_have_oracles():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    assert q - o == ROWS_ONLY, f"unexpected oracle-less queries: {q - o - ROWS_ONLY}"




def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["s_suppkey", "s_name", "pagerank"]
