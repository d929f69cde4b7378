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


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    """The bucketed equi-join must equal the naive inequality join
    exactly (inclusive bounds, many-to-many, cross-bucket intervals)
    and must NOT plan as BroadcastNestedLoopJoin/CartesianProduct."""
    from pyspark.sql import functions as F

    from go_cdc_spark.operators.asof import range_join
    from go_cdc_spark.plans.inspect import formatted_plan

    left = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 599), (3, 1, 600), (4, 1, 1800), (5, 2, 100)],
        "lid long, k long, t long",
    )
    right = spark.createDataFrame(
        [(10, 1, 0, 599), (11, 1, 550, 1250), (12, 2, 200, 300)],
        "rid long, k long, s long, e long",
    )
    out = range_join(left, right, ["k"], "t", "s", "e", bucket_width=600)
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    naive = left.join(right, "k").filter(
        (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
    )
    want = {(r["lid"], r["rid"]) for r in naive.collect()}
    assert got == want == {(1, 10), (2, 10), (2, 11), (3, 11)}
    plan = formatted_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # keyless intervals: a pure inequality join plans nested-loop; the
    # bucketed form stays an equi-join even with no key columns
    keyless = range_join(left, right.drop("k"), [], "t", "s", "e", 600)
    got_kl = {(r["lid"], r["rid"]) for r in keyless.collect()}
    naive_kl = left.crossJoin(right.drop("k").withColumnRenamed("rid", "rid2")).filter(
        (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
    )
    assert got_kl == {(r["lid"], r["rid2"]) for r in naive_kl.collect()}
    kl_plan = formatted_plan(keyless)
    assert "BroadcastNestedLoopJoin" not in kl_plan and "CartesianProduct" not in kl_plan
    nv_plan = formatted_plan(naive_kl)
    assert "BroadcastNestedLoopJoin" in nv_plan or "CartesianProduct" in nv_plan
    # auto bucket_width (median interval length) — same rows, same
    # nested-loop-free plan, no caller-tuned width needed
    auto = range_join(left, right, ["k"], "t", "s", "e")
    assert {(r["lid"], r["rid"]) for r in auto.collect()} == want
    auto_plan = formatted_plan(auto)
    assert "BroadcastNestedLoopJoin" not in auto_plan
    assert "CartesianProduct" not in auto_plan
