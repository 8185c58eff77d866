"""Local replica of the driver correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row counts + sorted value tuples. Uses sf0.001 for speed (the
driver uses sf0.01)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize_rows(cols, rows):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[cols.index(c)] if isinstance(row, tuple) else row[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (approximate operators)
        assert len(spark_rows) >= 0
        return
    con = _duck(SF_DIR)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    a = _normalize_rows(spark_cols, spark_rows)
    b = _normalize_rows(duck_cols, duck_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def test_every_query_has_oracle_or_reason():
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs
    # every operator is oracle-checked — including the approximate ANN
    # ops, whose LSH signatures are bit-reproducible across engines
    assert qs - os_ == set()
