"""Deterministic synthetic change-event log generator.

≙ the reference's test seeder (mongoreplay/seed.go:25-63, 2-template
deterministic doc generator) generalized into a parameterized oplog
factory — required because the sandbox allows no external data.

Fully executor-side deterministic: every choice is a pure column
expression over ``spark.range`` ids hashed with ``xxhash64(id, seed_k)``
— no RNG objects, no Python in the hot path, so the same (n_events,
seed, knobs) always produces byte-identical logs on any cluster size.

Guarantees (FIXTURES.md F2):
- (ts_t, ts_i) strictly increasing with ``seq`` ⇒ unique per event ⇒
  LWW ties impossible (SURVEY §2.2-2).
- op mix i/u/d by percentage; op='d' rows carry null payload
  (≙ delete oplog entries carrying only the key).
- optional hot-repo skew (one repo absorbs ``hot_pct`` of all events —
  the "monorepo" case the north_rule requires salting for).
- optional exact duplicates (≙ the boundary event re-read caused by
  ``ts >= resume_token``, collection.go:57-60).
- optional additive schema evolution: segments ≥ ``evolve_from_segment``
  gain a ``content_sha`` column; earlier segments lack it entirely.

The log is written as numbered parquet *segments* (``segment=K`` dirs):
a segment ≙ one oplog poll batch (tailer.go:52-91) and is the unit of
chunked replay + the file unit Structured Streaming rate-caps on
(maxFilesPerTrigger ≙ FetchCountThreshold, tailer.go:35).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from go_cdc_spark import schemas


@dataclass
class LogSpec:
    n_events: int = 10_000
    n_repos: int = 20
    n_paths: int = 50
    n_commits: int = 10
    seed: int = 42
    insert_pct: int = 45
    update_pct: int = 40  # delete_pct = 100 - insert - update
    hot_pct: int = 0  # % of events hitting repo_00000 (skew knob)
    dup_every: int = 0  # every k-th event also emitted twice (0 = off)
    events_per_second: int = 1000  # ts_i wraps at this
    segment_events: int = 2_000  # events per oplog segment
    files_per_segment: int = 8  # parquet files per segment dir (scan splits)
    evolve_from_segment: int | None = None  # segments >= this gain content_sha
    content_pad: int = 64  # min content length (payload size knob)
    base_ts: int = 1_700_000_000
    # Epoch bucket locality: when set, events are assigned to segments
    # by their KEY-BUCKET window instead of by time — segment =
    # round * windows + window, with ``windows = n_segments //
    # locality_rounds`` and window = the key's lake bucket (same
    # bucket_expr the sink routes with, over locality_n_buckets)
    # scaled down. Models a shard-/tenant-ordered feed (per-shard
    # change streams polled round-robin, key-range backfills): each
    # poll batch carries a narrow key slice, so a copy-on-write sink
    # rewrites only that slice's buckets. Order stamps stay global —
    # LWW resolution is unaffected by the arrival reorder.
    locality_n_buckets: int | None = None
    locality_rounds: int = 2  # passes over the bucket space


def _h(col, seed: int, k: int):
    """Deterministic 64-bit hash stream #k."""
    return F.xxhash64(col, F.lit(seed * 1_000_003 + k))


def events_df(spark: SparkSession, spec: LogSpec, parallelism: int | None = None) -> DataFrame:
    """Build the event log as a DataFrame (not yet written)."""
    n_par = parallelism or spark.sparkContext.defaultParallelism
    df = spark.range(0, spec.n_events, 1, n_par).withColumnRenamed("id", "seq")
    s = F.col("seq")

    op_h = F.pmod(_h(s, spec.seed, 1), F.lit(100))
    op = (
        F.when(op_h < spec.insert_pct, F.lit(schemas.INSERT_OP))
        .when(op_h < spec.insert_pct + spec.update_pct, F.lit(schemas.UPDATE_OP))
        .otherwise(F.lit(schemas.DELETE_OP))
    )

    # Skew: hot_pct% of events land on repo_00000 ("the monorepo").
    if spec.hot_pct > 0:
        hot = F.pmod(_h(s, spec.seed, 2), F.lit(100)) < spec.hot_pct
        repo_idx = F.when(hot, F.lit(0)).otherwise(
            F.lit(1) + F.pmod(_h(s, spec.seed, 3), F.lit(max(spec.n_repos - 1, 1)))
        )
    else:
        repo_idx = F.pmod(_h(s, spec.seed, 3), F.lit(spec.n_repos))
    path_idx = F.pmod(_h(s, spec.seed, 4), F.lit(spec.n_paths))
    commit_idx = F.pmod(_h(s, spec.seed, 5), F.lit(spec.n_commits))

    repo = F.format_string("repo_%05d", repo_idx)
    path = F.format_string("src/pkg_%02d/mod_%03d.py", path_idx % 7, path_idx)
    # 40-hex "commit" derived from the (repo,path,commit_idx) identity.
    commit = F.substring(
        F.sha2(F.concat_ws("|", repo, path, commit_idx.cast("string")), 256), 1, 40
    )

    is_del = op == schemas.DELETE_OP
    lang = F.when(is_del, F.lit(None).cast("string")).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in ("py", "go", "java", "rs", "ts")]),
            (F.pmod(_h(s, spec.seed, 6), F.lit(5)) + 1).cast("int"),
        )
    )
    body = F.concat_ws(
        "#",
        F.lit("content"),
        repo,
        path,
        commit,
        s.cast("string"),
        F.repeat(F.lit("x"), spec.content_pad),
    )
    content = F.when(is_del, F.lit(None).cast("string")).otherwise(body)

    out = df.select(
        op.alias("op"),
        (F.lit(spec.base_ts) + (s / spec.events_per_second).cast("long")).alias("ts_t"),
        F.pmod(s, F.lit(spec.events_per_second)).alias("ts_i"),
        s.alias("seq"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )

    if spec.dup_every and spec.dup_every > 0:
        # Exact duplicate of every k-th event (same seq!) ≙ at-least-once
        # boundary re-reads the apply path must dedupe (SURVEY §2.2-1).
        dups = out.filter(F.pmod(F.col("seq"), F.lit(spec.dup_every)) == 0)
        out = out.unionAll(dups)
    return out


def write_segments(spark: SparkSession, spec: LogSpec, out_dir: str) -> int:
    """Write the log as parquet segment dirs; returns segment count.

    Segment K holds events with seq ∈ [K*segment_events, (K+1)*...).
    When ``evolve_from_segment`` is set, later segments carry the extra
    ``content_sha`` column and earlier segments do not (true on-disk
    additive schema evolution, north_rule).
    """
    df = events_df(spark, spec)
    n_segments = (spec.n_events + spec.segment_events - 1) // spec.segment_events
    if spec.locality_n_buckets:
        # bucket-windowed segments (see LogSpec.locality_n_buckets):
        # the SAME hash the lake's bucket_expr routes with, so a
        # segment's keys land in a contiguous slice of lake buckets
        from go_cdc_spark.sinks.lake import bucket_expr

        rounds = max(spec.locality_rounds, 1)
        windows = max(n_segments // rounds, 1)
        b = bucket_expr(list(schemas.KEY_COLS), spec.locality_n_buckets)
        rnd = F.floor(F.col("seq") * F.lit(rounds) / F.lit(spec.n_events))
        win = F.floor(b * F.lit(windows) / F.lit(spec.locality_n_buckets))
        df = df.withColumn("segment", (rnd * windows + win).cast("long"))
        n_segments = rounds * windows
    else:
        df = df.withColumn(
            "segment", (F.col("seq") / F.lit(spec.segment_events)).cast("long")
        )
    # several files per segment dir ⇒ the replay scan has enough input
    # splits to saturate wide clusters (a real oplog lands as many
    # small files per poll window anyway)
    fps = max(spec.files_per_segment, 1)
    sub = F.pmod(F.xxhash64("seq", F.lit(spec.seed)), F.lit(fps))

    def _write(d, mode):
        # visible sort on the partition col skips planned write's re-sort
        d.repartition(int(n_segments * fps), "segment", sub).sortWithinPartitions(
            "segment"
        ).write.partitionBy("segment").mode(mode).parquet(out_dir)

    evolve_at = spec.evolve_from_segment
    if evolve_at is None:
        _write(df, "overwrite")
    else:
        old = df.filter(F.col("segment") < evolve_at)
        new = df.filter(F.col("segment") >= evolve_at).withColumn(
            "content_sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
        )
        _write(old, "overwrite")
        _write(new, "append")
    return n_segments


def snapshot_source_df(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic snapshot-source table (FIXTURES.md F4): the
    "collection to dump" with creation timestamps, ≙ seed.go templates."""
    spec = LogSpec(n_events=n_rows, seed=seed, insert_pct=100, update_pct=0)
    df = events_df(spark, spec)
    # A source collection has one live doc per key: LWW over the insert
    # stream (keys may repeat within the generated ids).
    from go_cdc_spark.operators.resolve import lww_resolve

    return lww_resolve(
        df, schemas.KEY_COLS, schemas.ORDER_COLS, schemas.PAYLOAD_COLS
    ).drop("op")
