"""Bookmark store tests ≙ resume_token_store.go + tailer_manager.go
(store/fetch roundtrip; missing store ⇒ zero token)."""

from __future__ import annotations

from go_cdc_spark import schemas
from go_cdc_spark.bookmark import BookmarkRow, BookmarkStore


def _row(epoch, seq, status="success", stage="tail"):
    return BookmarkRow(
        pipeline_id="p1", epoch=epoch, ts_t=1_700_000_000, ts_i=0, seq=seq,
        stage=stage, status=status, event_count=10,
        partition_counts={"0": 4, "1": 6}, metrics={"seconds": 0.5},
    )


def test_missing_store_yields_zero_token(tmpdir_path):
    assert BookmarkStore(tmpdir_path, "nope").latest_token() == schemas.ZERO_TOKEN


def test_roundtrip_and_latest(tmpdir_path):
    s = BookmarkStore(tmpdir_path, "p1")
    s.record(_row(0, 100))
    s.record(_row(1, 200))
    s.record(_row(2, 300, status="failed"))  # failed epochs don't advance token
    assert s.latest_token() == (1_700_000_000, 0, 200)
    assert s.committed_epochs() == {0, 1}


def test_per_pipeline_isolation(tmpdir_path):
    # fixes the reference's shared-global-token-file bug
    # (resume_token_store.go:12, SURVEY §2.2-5)
    a, b = BookmarkStore(tmpdir_path, "a"), BookmarkStore(tmpdir_path, "b")
    a.record(_row(0, 100))
    assert b.latest_token() == schemas.ZERO_TOKEN


def test_lineage_dataframe(spark, tmpdir_path):
    s = BookmarkStore(tmpdir_path, "p1")
    s.record(_row(0, 100))
    df = s.to_dataframe(spark)
    assert df.count() == 2  # one row per partition
    assert {r["partition_id"] for r in df.collect()} == {0, 1}
