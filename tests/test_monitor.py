"""Event-time windowed rates: batch twin + streaming watermark
semantics (late data dropped, closed windows emit exactly once)."""

from __future__ import annotations

import os
import time

from go_cdc_spark import schemas
from go_cdc_spark.config import PipelineConfig
from go_cdc_spark.streaming.monitor import stream_windowed_rates, windowed_rates


def _ev(op, ts_t, seq, user=1):
    # (op, ts_t, ts_i, seq, repo, path, commit, lang, content)
    return (op, ts_t, 0, seq, f"r{user}", "p", "c", "py", "x")


def _log_df(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.EVENT_SCHEMA)


def test_windowed_rates_matches_manual_floor(spark):
    """F.window's tumbling grid == floor(epoch/width)*width, and the
    rate is count/width — checked against a hand-computed twin."""
    rows = [_ev("i", 30, 1), _ev("i", 59, 2), _ev("u", 60, 3), _ev("d", 125, 4)]
    got = {
        (r["window_start"], r["op"]): (r["n_events"], r["events_per_sec"])
        for r in windowed_rates(_log_df(spark, rows), "1 minutes").collect()
    }
    assert got == {
        (0, "i"): (2, round(2 / 60, 6)),
        (60, "u"): (1, round(1 / 60, 6)),
        (120, "d"): (1, round(1 / 60, 6)),
    }


def test_stream_windowed_rates_watermark_semantics(spark, tmpdir_path):
    """Watermark semantics end-to-end through the file-stream source,
    one micro-batch per file. Three guarantees pinned:

    1. a late event arriving while its window state is still LIVE
       (watermark not yet past the window end) merges into the window;
    2. a window emits exactly once, after the watermark passes its end
       (append mode) — and an event arriving AFTER that eviction is
       dropped, never resurrecting or double-emitting the window;
    3. a window the watermark never passes does not emit at all
       (bounded state, no premature output).
    """
    log = os.path.join(tmpdir_path, "log")
    # batch 0: one event in window [60,120); the t=500 event sets the
    # post-batch watermark to 440, which evicts [60,120) only at the
    # END of the next batch — so the window enters batch 1 still live
    _log_df(spark, [_ev("i", 100, 1), _ev("i", 500, 2)]).coalesce(1).write.parquet(
        os.path.join(log, "segment=0")
    )
    time.sleep(1.1)  # file-stream source orders batches by mod time
    # batch 1: t=110 is late but its window is STILL LIVE at batch
    # start (watermark 440 evicts [60,120) only at this batch's END) ⇒
    # merges (guarantee 1); the window then closes with count 2.
    _log_df(spark, [_ev("i", 110, 3)]).coalesce(1).write.parquet(
        os.path.join(log, "segment=1")
    )
    time.sleep(1.1)
    # batch 2: t=105 targets the now-EVICTED window ⇒ dropped
    # (guarantee 2); t=100000's window never closes ⇒ never emits
    # (guarantee 3).
    _log_df(spark, [_ev("i", 105, 4), _ev("u", 100_000, 5)]).coalesce(1).write.parquet(
        os.path.join(log, "segment=2")
    )
    cfg = PipelineConfig(
        pipeline_id="mon2",
        source_log_path=log,
        table_root=os.path.join(tmpdir_path, "no_table"),
        bookmark_root=os.path.join(tmpdir_path, "bm"),
    )
    q = stream_windowed_rates(
        spark, cfg, out_table="rates2", window="1 minutes",
        watermark="60 seconds", max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    rows = [
        (r["window_start"], r["op"], r["n_events"])
        for r in spark.sql("SELECT * FROM rates2").collect()
    ]
    emitted_60 = [r for r in rows if r[0] == 60]
    assert emitted_60 == [(60, "i", 2)]  # one emission; live-late t=110
    #                                      merged, post-eviction t=105 dropped
    assert (480, "i", 1) in rows
    assert not any(op == "u" for _, op, _n in rows)  # open window: no output


def test_stream_dedup_events_within_watermark(spark, tmpdir_path):
    """Re-delivered events across micro-batches (the oplog's
    duplicate-boundary re-read) are dropped in flight; state stays
    bounded by the watermark, so far-apart same-seq events (outside the
    dedup horizon) pass — the documented within-watermark contract."""
    log = os.path.join(tmpdir_path, "log")
    # batch 0: seq 1,2 at t≈100
    _log_df(spark, [_ev("i", 100, 1), _ev("i", 101, 2)]).coalesce(1).write.parquet(
        os.path.join(log, "segment=0")
    )
    time.sleep(1.1)
    # batch 1: seq 2 re-delivered (within horizon — dropped) + seq 3
    _log_df(spark, [_ev("i", 101, 2), _ev("u", 102, 3)]).coalesce(1).write.parquet(
        os.path.join(log, "segment=1")
    )
    cfg = PipelineConfig(
        pipeline_id="sdd",
        source_log_path=log,
        table_root=os.path.join(tmpdir_path, "nt"),
        bookmark_root=os.path.join(tmpdir_path, "bm"),
    )
    from go_cdc_spark.streaming.monitor import stream_dedup_events

    q = stream_dedup_events(
        spark, cfg, out_table="dd1", watermark="60 seconds",
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    seqs = sorted(r["seq"] for r in spark.sql("SELECT seq FROM dd1").collect())
    assert seqs == [1, 2, 3]  # the re-delivered seq=2 was dropped once


def test_sessionize_gap_semantics(spark):
    """Sessions split exactly where the gap EXCEEDS the threshold
    (boundary gap == threshold stays in-session); per-key numbering is
    1-based and independent across keys."""
    from go_cdc_spark.streaming.monitor import sessionize

    rows = [
        # key 1: ts 0,100 | gap 1801 -> new session at 1901, 1950
        (1, 0, 1), (1, 100, 2), (1, 1901, 3), (1, 1950, 4),
        # boundary: gap exactly 1800 does NOT split
        (2, 0, 5), (2, 1800, 6),
    ]
    df = spark.createDataFrame(rows, "user_id long, t long, event_id long")
    out = sessionize(df, ["user_id"], ts_col="t", gap_seconds=1800,
                     order_cols=["event_id"])
    got = {(r["user_id"], r["session_seq"]): (r["session_start"], r["session_end"], r["n_events"])
           for r in out.collect()}
    assert got == {
        (1, 1): (0, 100, 2),
        (1, 2): (1901, 1950, 2),
        (2, 1): (0, 1800, 2),
    }


def test_stream_change_feed_publishes_versions(spark, tmpdir_path):
    """Streaming CDF publisher: readStream over the commit log turns
    each new version into an idempotently published per-version diff;
    a second run with the same checkpoint publishes ONLY new commits."""
    from go_cdc_spark import schemas as S
    from go_cdc_spark.operators.resolve import lww_resolve
    from go_cdc_spark.sinks.lake import ParquetLakeTable
    from go_cdc_spark.streaming.changefeed import (
        read_change_feed,
        stream_change_feed,
    )

    def _row(op, seq, key, content="x"):
        r, p, c = key
        lang, cont = (None, None) if op == "d" else ("py", content)
        return (op, 1_700_000_000, seq, seq, r, p, c, lang, cont)

    def _batch(rows):
        df = spark.createDataFrame(rows, schema=S.EVENT_SCHEMA)
        return lww_resolve(df, S.KEY_COLS, S.ORDER_COLS, S.PAYLOAD_COLS)

    root = f"{tmpdir_path}/table"
    t = ParquetLakeTable.create(spark, root, S.TABLE_SCHEMA, S.KEY_COLS, 4)
    t.apply_batch(_batch([_row("i", 1, ("r1", "p", "c"), "a"),
                          _row("i", 2, ("r2", "p", "c"), "b")]), "e1")
    t.apply_batch(_batch([_row("u", 3, ("r1", "p", "c"), "a2")]), "e2")
    cp, out = f"{tmpdir_path}/cp", f"{tmpdir_path}/out"
    stream_change_feed(spark, root, cp, out).awaitTermination(120)
    fed = read_change_feed(spark, out)
    by_v = {(r["version"], r["repo"]): r["change_type"] for r in fed.collect()}
    assert by_v == {
        (1, "r1"): "insert", (1, "r2"): "insert",  # v1: bootstrap inserts
        (2, "r1"): "update",
    }
    # new commit -> rerun with same checkpoint publishes only v3
    t.apply_batch(_batch([_row("d", 4, ("r2", "p", "c"))]), "e3")
    stream_change_feed(spark, root, cp, out).awaitTermination(120)
    fed2 = {(r["version"], r["repo"]): r["change_type"]
            for r in read_change_feed(spark, out).collect()}
    assert fed2 == {**by_v, (3, "r2"): "delete"}


def test_stream_change_feed_survives_vacuum(spark, tmpdir_path):
    """A feed that lagged past vacuum retention must NOT wedge: fully
    expired versions are skipped with an explicit marker, a version
    whose BASE manifest expired publishes the full snapshot as inserts
    (marked), and versions with both manifests publish normal diffs."""
    from go_cdc_spark import schemas as S
    from go_cdc_spark.operators.resolve import lww_resolve
    from go_cdc_spark.sinks.lake import ParquetLakeTable
    from go_cdc_spark.streaming.changefeed import (
        read_change_feed,
        stream_change_feed,
    )

    def _row(op, seq, key, content="x"):
        r, p, c = key
        lang, cont = (None, None) if op == "d" else ("py", content)
        return (op, 1_700_000_000, seq, seq, r, p, c, lang, cont)

    def _batch(rows):
        df = spark.createDataFrame(rows, schema=S.EVENT_SCHEMA)
        return lww_resolve(df, S.KEY_COLS, S.ORDER_COLS, S.PAYLOAD_COLS)

    root = f"{tmpdir_path}/table"
    t = ParquetLakeTable.create(spark, root, S.TABLE_SCHEMA, S.KEY_COLS, 4)
    t.apply_batch(_batch([_row("i", 1, ("r1", "p", "c"), "a")]), "e1")  # v1
    t.apply_batch(_batch([_row("i", 2, ("r2", "p", "c"), "b")]), "e2")  # v2
    t.apply_batch(_batch([_row("u", 3, ("r1", "p", "c"), "a2")]), "e3")  # v3
    t.apply_batch(_batch([_row("u", 4, ("r2", "p", "c"), "b2")]), "e4")  # v4
    t.vacuum(keep_manifests=2)  # only v3 and v4 manifests survive
    cp, out = f"{tmpdir_path}/cp", f"{tmpdir_path}/out"
    stream_change_feed(spark, root, cp, out).awaitTermination(120)

    # v1, v2 manifests were deleted before discovery: the file source
    # never sees them (nothing reconstructable, nothing published)
    for v in (1, 2):
        assert not os.path.exists(f"{out}/version={v}")
    # v3: base (v2) expired -> full snapshot of v3 as inserts, marked
    assert os.path.exists(f"{out}/version=3/_FULL_SNAPSHOT.txt")
    fed = {(r["version"], r["repo"]): (r["change_type"], r["content"])
           for r in read_change_feed(spark, out).collect()}
    assert fed == {
        (3, "r1"): ("insert", "a2"), (3, "r2"): ("insert", "b"),
        (4, "r2"): ("update", "b2"),  # v4: normal diff v3 -> v4
    }


def test_stream_readers_reject_unknown_format(spark, tmpdir_path):
    """cfg.source_format typos must raise, not silently read the
    segments as parquet."""
    import pytest

    cfg = PipelineConfig(
        pipeline_id="fmt",
        source_log_path=f"{tmpdir_path}/log",
        table_root=f"{tmpdir_path}/table",
        bookmark_root=f"{tmpdir_path}/bm",
        source_format="jsonl",
    )
    with pytest.raises(ValueError, match="unknown source_format"):
        stream_windowed_rates(spark, cfg, "fmt_rates")
