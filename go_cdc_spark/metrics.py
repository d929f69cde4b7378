"""Pipeline metrics: throughput, lag, lineage summaries.

≙ the reference's Stage heartbeat/metadata (stage_tracker.go:23-32),
extended with the event-count/lag metrics the north_rule requires.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from go_cdc_spark.bookmark import BookmarkStore


def replication_lag(
    spark: SparkSession, log_dir: str, bookmarks: BookmarkStore
) -> dict:
    """Lag = max source position − max applied position (in events and
    in log seconds)."""
    src = (
        spark.read.option("mergeSchema", "true")
        .parquet(log_dir)
        .agg(
            F.max(F.struct("ts_t", "ts_i", "seq")).alias("m"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    applied = bookmarks.latest_token()
    src_pos = (src["m"]["ts_t"], src["m"]["ts_i"], src["m"]["seq"]) if src["m"] else (0, 0, -1)
    return {
        "source_hwm": src_pos,
        "applied_hwm": applied,
        "lag_seconds": max(src_pos[0] - applied[0], 0),
        "lag_events": max(src_pos[2] - applied[2], 0),
        "caught_up": applied >= src_pos,
    }


def throughput_summary(bookmarks: BookmarkStore) -> dict:
    rows = [r for r in bookmarks.rows() if r.stage == "tail" and r.status == "success"]
    total_events = sum(r.event_count for r in rows)
    total_secs = sum(r.metrics.get("seconds", 0.0) for r in rows)
    return {
        "epochs": len(rows),
        "events": total_events,
        "seconds": round(total_secs, 3),
        "events_per_sec": round(total_events / total_secs, 1) if total_secs else 0.0,
    }
