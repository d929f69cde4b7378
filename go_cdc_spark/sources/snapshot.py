"""Snapshot ("dump") stage.

≙ Dumper (reference mongoreplay/dumper.go:57-163): truncate the
destination, copy every source row, stamp the resume token with the
max creation timestamp so tailing starts with overlap, not a gap
(dumper.go:85,106-109 — SURVEY §2.2-4). Here: one declarative
overwrite job + a bookmark row; the per-row channel/buffer machinery
(dumper.go:113-138) has no Spark equivalent because the micro-batch
IS the buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_cdc_spark import schemas
from go_cdc_spark.bookmark import BookmarkRow, BookmarkStore
from go_cdc_spark.operators.resolve import apply_filters
from go_cdc_spark.sinks.lake import CommitStats, ParquetLakeTable


def run_snapshot(
    source_df: DataFrame,
    lake: ParquetLakeTable,
    bookmarks: BookmarkStore,
    filters=(),
    epoch: int = -1,
) -> CommitStats:
    """source_df: table rows + (ts_t, ts_i, seq) creation stamps."""
    if filters:
        source_df = apply_filters(source_df, filters)

    hwm = source_df.agg(
        F.max(F.struct("ts_t", "ts_i", "seq")).alias("m")
    ).collect()[0]["m"]
    token = (hwm["ts_t"], hwm["ts_i"], hwm["seq"]) if hwm else schemas.ZERO_TOKEN

    # Pass the per-row creation stamps (ts_t, ts_i, seq) through: the
    # sink stores them so a replayed boundary event (the deliberate
    # snapshot/tail overlap, SURVEY §2.2-4) merges order-aware instead
    # of blindly overwriting.
    table_cols = [f.name for f in lake.schema.fields]
    extra = [c for c in source_df.columns if c not in table_cols + ["op"]]
    stats = lake.overwrite(
        source_df.select(*table_cols, *extra), epoch_key=f"snapshot-{epoch}"
    )
    bookmarks.record(
        BookmarkRow(
            pipeline_id=bookmarks.pipeline_id,
            epoch=epoch,
            ts_t=token[0],
            ts_i=token[1],
            seq=token[2],
            stage="snapshot",
            status="success",
            event_count=stats.rows_written,
            partition_counts={str(b): n for b, n in stats.bucket_counts.items()},
        )
    )
    return stats
