"""Generator determinism tests ≙ seeder tests (seed_test.go:13-36)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_cdc_spark.genlog import LogSpec, events_df, snapshot_source_df, write_segments


def test_generator_deterministic(spark):
    spec = LogSpec(n_events=3_000, seed=42)
    a = events_df(spark, spec, parallelism=2).sort("seq").collect()
    b = events_df(spark, spec, parallelism=8).sort("seq").collect()
    assert a == b  # identical regardless of parallelism


def test_order_tuple_unique_and_monotone(spark):
    df = events_df(spark, LogSpec(n_events=5_000, seed=1))
    n = df.select("ts_t", "ts_i", "seq").distinct().count()
    assert n == 5_000
    bad = df.filter(
        (F.col("ts_t") != 1_700_000_000 + (F.col("seq") / 1000).cast("long"))
        | (F.col("ts_i") != F.pmod(F.col("seq"), F.lit(1000)))
    ).count()
    assert bad == 0


def test_delete_rows_null_payload_and_op_mix(spark):
    df = events_df(spark, LogSpec(n_events=10_000, seed=5)).cache()
    dels = df.filter("op = 'd'")
    assert dels.filter("lang is not null or content is not null").count() == 0
    mix = {r["op"]: r["n"] for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert set(mix) == {"i", "u", "d"}
    assert abs(mix["i"] / 10_000 - 0.45) < 0.05
    df.unpersist()


def test_segments_and_evolution(spark, tmpdir_path):
    spec = LogSpec(n_events=4_000, segment_events=1_000, evolve_from_segment=2, seed=9)
    n = write_segments(spark, spec, tmpdir_path)
    assert n == 4
    old = spark.read.parquet(f"{tmpdir_path}/segment=0")
    new = spark.read.parquet(f"{tmpdir_path}/segment=3")
    assert "content_sha" not in old.columns and "content_sha" in new.columns
    total = spark.read.option("mergeSchema", "true").parquet(tmpdir_path).count()
    assert total == 4_000


def test_snapshot_source(spark):
    df = snapshot_source_df(spark, 500, seed=2)
    assert df.count() == df.select("repo", "path", "commit").distinct().count()
    assert df.filter("content is null").count() == 0
