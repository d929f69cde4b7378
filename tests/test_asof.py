"""As-of join: semantics (inclusive, left-join nulls, tie-break) and
plan shape (single shuffle — the reason for the union+window form)."""

from __future__ import annotations

from go_cdc_spark.operators.asof import asof_join
from go_cdc_spark.plans.inspect import shuffle_count


def _frames(spark):
    left = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 2), (102, 2, 1), (103, 1, 1)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 2, 20.0, 7), (1, 4, 40.0, 8), (2, 9, 90.0, 9), (1, 2, 25.0, 10)],
        "k long, ts long, v double, seq long",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, key_cols=["k"], ts_col="ts",
        payload_cols=["v"], tiebreak_cols=["seq"],
    )
    got = {r["lid"]: r["v"] for r in out.collect()}
    assert got == {
        100: 40.0,   # latest right at ts<=5 is ts=4
        101: 25.0,   # inclusive ts<=2; (1,2) tie -> seq 10 wins over 7
        102: None,   # no right row at-or-before ts=1 for k=2
        103: None,   # ts=1 precedes every right row for k=1
    }
    # left columns pass through untouched
    assert set(out.columns) == {"lid", "k", "ts", "v"}


def test_asof_join_single_shuffle(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", ["v"], ["seq"])
    assert shuffle_count(out) == 1, "as-of join must be one key shuffle"
