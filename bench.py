#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries from __spark_entry__.queries() at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the end-to-end CDC replay pipeline over
a deterministically generated oplog scaled to the sf, and prints ONE
JSON line:

  {"metric": "...", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "replay_events_per_sec": ...}

Scaling-efficiency evidence (same job at N vs 4N local threads) is
produced by bench_scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# events in the generated replay log, proportional to sf
_SF_GUESS = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1, "sf1": 1.0}
SF = next((v for k, v in _SF_GUESS.items() if k in SF_DIR), 0.1)
REPLAY_EVENTS = int(os.environ.get("SPARK_GRAFT_REPLAY_EVENTS", str(int(20_000_000 * SF))))


def alloc_gbps() -> float:
    """Page-allocation-path probe (GB/s): copies a fresh 200 MB buffer,
    so every destination page is a cold fault. On this host the STEADY-
    STATE copy bandwidth stays ~10 GB/s while the fault path
    intermittently collapses 100× under co-tenant pressure (measured
    0.04 GB/s ≈ 25 µs per 4 KB fault with the guest 99% idle) — and
    Spark/numpy constantly allocate, so a timed run inside such a
    window measures the hypervisor, not the engine. Stamping the probe
    into the bench JSON makes every recorded run self-document its
    window quality."""
    import time as _t

    import numpy as _np

    a = _np.zeros(200_000_000, dtype=_np.uint8)
    t0 = _t.time()
    a.copy()
    return round(0.2 / (_t.time() - t0), 2)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .appName("go_cdc_spark-bench")
        .getOrCreate()
    )


def time_query(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def bench_replay(spark, n_events: int, mode: str = "cow") -> tuple[float, dict]:
    """End-to-end: generated oplog (skewed, with duplicates and mid-log
    schema evolution) replayed into a fresh lake table. Generation is
    excluded from the timed window."""
    from go_cdc_spark import schemas
    from go_cdc_spark.config import PipelineConfig
    from go_cdc_spark.genlog import LogSpec, write_segments
    from go_cdc_spark.sinks.lake import ParquetLakeTable
    from go_cdc_spark.streaming.replay import replay_chunked

    d = tempfile.mkdtemp(prefix="go_cdc_bench_")
    try:
        cfg = PipelineConfig(
            "bench",
            f"{d}/log",
            f"{d}/table",
            f"{d}/bm",
            # 32 (was 64): measured 1.3-8x faster at local[32] on both
            # modes — halves per-epoch file creates / parquet writer
            # opens, and MoR delta files stop being pathologically tiny
            # (same A/B direction as bench_scaling's --n-buckets default)
            n_buckets=32,
            salt_partitions=None,
        )
        n_segments = 8
        spec = LogSpec(
            n_events=n_events,
            n_repos=max(n_events // 2000, 20),
            n_paths=200,
            n_commits=50,
            hot_pct=30,
            dup_every=997,
            segment_events=max(n_events // n_segments, 1),
            evolve_from_segment=n_segments // 2,
            seed=42,
        )
        write_segments(spark, spec, cfg.source_log_path)
        ParquetLakeTable.create(
            spark, cfg.table_root, schemas.TABLE_SCHEMA, cfg.key_cols,
            cfg.n_buckets, mode=mode,
        )
        t0 = time.time()
        results = replay_chunked(spark, cfg, chunk_segments=2)
        dt = time.time() - t0
        events = sum(r.events for r in results)
        # the timed window INCLUDES mid-replay additive schema evolution
        # (segments >= 4 of 8 carry content_sha, so epoch 3 of 4 ALTERs
        # the live table under load — the north rule's "schema
        # evolution" clause at bench scale, not just at sf0.01 tests);
        # assert the evolved column actually reached the table so a
        # regression in the hot-loop union_schema path fails the bench
        # loudly instead of silently benching a narrower workload.
        final_cols = set(
            ParquetLakeTable(spark, cfg.table_root).read().columns
        )
        assert "content_sha" in final_cols, (
            f"mid-replay schema evolution missing from benched table: {final_cols}"
        )
        return dt, {
            "replay_events": events,
            "replay_epochs": len(results),
            # rows physically written across all epochs: CoW counts the
            # rewritten-bucket volume, so written/events is the
            # write-amplification ratio bucket pruning bounds
            "rows_written": sum(r.rows_written for r in results),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def bench_cow_pruning(spark, n_base: int, n_tail: int) -> dict:
    """Bucket-pruned copy-on-write, isolated: the same 8-epoch tail of
    ``n_tail`` events replayed onto two identically-seeded ~``n_base``-
    key tables — once as a uniformly-hashed feed (every epoch touches
    all 32 buckets, so CoW rewrites the WHOLE table per epoch) and once
    as a shard-ordered feed (LogSpec.locality_n_buckets: each epoch's
    keys live in one 4-bucket window, 12.5%). Identical epoch count,
    event count, and table size — the only variable is the touched-
    bucket fraction, which is the real 100 TB operating point (O(10k)
    buckets, ~1%-key batches), not the e2e bench's worst case where the
    batch spans every bucket of a table it is itself growing. The
    reference's Dumper rewrites everything regardless of what changed
    (dumper.go:140-163); affected-bucket pruning in apply_batch is the
    fix, and rows-written per input event is the evidence. Seeding and
    generation are excluded from the timed windows."""
    from go_cdc_spark import schemas
    from go_cdc_spark.config import PipelineConfig
    from go_cdc_spark.genlog import LogSpec, events_df, write_segments
    from go_cdc_spark.sinks.lake import ParquetLakeTable
    from go_cdc_spark.streaming.replay import replay_chunked

    d = tempfile.mkdtemp(prefix="go_cdc_cowprune_")
    try:
        n_repos = max(n_base // 2000, 20)
        base_spec = LogSpec(
            n_events=n_base, n_repos=n_repos, n_paths=200, n_commits=50,
            insert_pct=100, update_pct=0, seed=7,
        )
        base = (
            events_df(spark, base_spec)
            .dropDuplicates(list(schemas.KEY_COLS))
            .select(*schemas.KEY_COLS, *schemas.PAYLOAD_COLS)
        )
        out: dict = {}
        for tag, locality in (("full", None), ("pruned", 32)):
            cfg = PipelineConfig(
                f"cowprune_{tag}",
                f"{d}/log_{tag}",
                f"{d}/table_{tag}",
                f"{d}/bm_{tag}",
                n_buckets=32,
                salt_partitions=None,
            )
            tail_spec = LogSpec(
                n_events=n_tail, n_repos=n_repos, n_paths=200, n_commits=50,
                hot_pct=30, dup_every=997,
                segment_events=max(n_tail // 8, 1), seed=42,
                locality_n_buckets=locality, locality_rounds=1,
            )
            write_segments(spark, tail_spec, cfg.source_log_path)
            t = ParquetLakeTable.create(
                spark, cfg.table_root, schemas.TABLE_SCHEMA, cfg.key_cols,
                cfg.n_buckets, mode="cow",
            )
            t.overwrite(base, epoch_key="seed")  # untimed
            t0 = time.time()
            results = replay_chunked(spark, cfg, chunk_segments=1)
            dt = time.time() - t0
            applied = [r for r in results if r.events]
            widths = [len(r.bucket_counts) for r in applied]
            if locality:  # the pruning claim itself
                assert max(widths) <= 4, f"pruned epoch too wide: {widths}"
            out[tag] = {
                "sec": round(dt, 3),
                "events": sum(r.events for r in results),
                "rows_written": sum(r.rows_written for r in results),
                "epochs": len(applied),
                "max_buckets_per_epoch": max(widths),
            }
        return out
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _prod_mode_queries() -> dict:
    """SHIPPING-mode twins of the dual-mode operators whose driver
    entries run in oracle mode (hex-digest / init-only hashing bought
    the exact DuckDB twin but is NOT the production path — parity
    between modes is pinned by tests/test_functions.py). Benched so the
    recorded numbers reflect what a user actually runs; these are extra
    timings only, not CORRECTNESS rows."""
    from pyspark.sql import functions as F

    def simhash_prod(spark, sf_dir):
        from go_cdc_spark.functions.dedup import simhash_near_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return simhash_near_pairs(docs, max_hamming=3)  # xxhash64 mode

    def ivf_prod(spark, sf_dir):
        from go_cdc_spark.functions.similarity import ivf_ann_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        return ivf_ann_topk(emb, q, k=10, n_centroids=16, n_probe=12)

    def semantic_dedup_prod(spark, sf_dir):
        from go_cdc_spark.functions.similarity import semantic_dedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return semantic_dedup(emb, threshold=0.4, n_centroids=16)

    return {
        "dedup_simhash_prod": simhash_prod,
        "sim_ann_ivf_prod": ivf_prod,
        "sim_semantic_dedup_prod": semantic_dedup_prod,
    }


def main() -> None:
    import __spark_entry__ as entry

    probe_pre = alloc_gbps()
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/scan path once (excluded from timings)
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in entry.queries().items():
        timings[name] = round(time_query(fn(spark, SF_DIR)), 3)
    for name, fn in _prod_mode_queries().items():
        timings[name] = round(time_query(fn(spark, SF_DIR)), 3)

    replay_sec, replay_info = bench_replay(spark, REPLAY_EVENTS, mode="cow")
    timings["cdc_replay_e2e"] = round(replay_sec, 3)
    mor_sec, mor_info = bench_replay(spark, REPLAY_EVENTS, mode="mor")
    timings["cdc_replay_e2e_mor"] = round(mor_sec, 3)
    # half-sf base table + 5%-of-events tail: the ratio (touched-bucket
    # fraction × table/batch size) carries the evidence, and the full-
    # touch leg's whole-table-rewrite cost is what we're proving
    # against — keep it bounded
    prune = bench_cow_pruning(spark, REPLAY_EVENTS // 2, max(REPLAY_EVENTS // 20, 8))
    timings["cdc_cow_tail_full"] = prune["full"]["sec"]
    timings["cdc_cow_tail_pruned"] = prune["pruned"]["sec"]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_replay",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF,
                "cpus": CPUS,
                "replay_events": replay_info["replay_events"],
                "replay_events_per_sec": round(
                    replay_info["replay_events"] / replay_sec, 1
                )
                if replay_sec
                else 0.0,
                "replay_events_per_sec_mor": round(
                    mor_info["replay_events"] / mor_sec, 1
                )
                if mor_sec
                else 0.0,
                # Bucket-pruned CoW (bench_cow_pruning): identical
                # 8-epoch tail onto identically-seeded tables; "full"
                # touches all 32 buckets per epoch (whole-table rewrite,
                # the Dumper anti-pattern), "pruned" touches 4 (12.5%).
                # write_amp = rows physically written / input events.
                "cow_prune": {
                    tag: {
                        **v,
                        "write_amp": round(v["rows_written"] / v["events"], 2),
                        "events_per_sec": round(v["events"] / v["sec"], 1)
                        if v["sec"]
                        else 0.0,
                    }
                    for tag, v in prune.items()
                },
                "cow_prune_speedup": round(
                    prune["full"]["sec"] / prune["pruned"]["sec"], 2
                )
                if prune["pruned"]["sec"]
                else 0.0,
                # host-window quality: page-alloc-path GB/s before/after
                # (≥3 ⇒ clean; ≤0.2 ⇒ co-tenant slam, timings unusable)
                "alloc_gbps_pre": probe_pre,
                "alloc_gbps_post": alloc_gbps(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
