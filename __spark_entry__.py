"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over
the driver's testdata tables; each entry has a DuckDB ``oracle_sql()``
equivalent (same column names, order-insensitive value parity).

The CDC family derives a change-event view from the ``events`` table:
  key   = user_id                (≙ Mongo _id, query_generator.go:56)
  op    = signup→'i', error→'d', else 'u'   (≙ message.go:17-21)
  order = (ts, event_id)         (≙ primitive.Timestamp (T, I))
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_SMOKE = "/root/testdata/sf0.001"

# split point for snapshot-vs-tail style queries
_SPLIT = "2024-01-15 00:00:00"
_TOKEN_TS = "2024-01-15 00:00:00"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _op(df: DataFrame):
    return (
        F.when(df["event_type"] == "signup", F.lit("i"))
        .when(df["event_type"] == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )


_OP_SQL = "CASE event_type WHEN 'signup' THEN 'i' WHEN 'error' THEN 'd' ELSE 'u' END"


def _lww_state(ev: DataFrame) -> DataFrame:
    """LWW winner per key over a derived change-event view.

    One shuffle: groupBy(key).agg(max(struct(order..., op, payload))).
    ≙ SURVEY §2 O13 (ordered replay / implicit LWW)."""
    w = F.max(
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            _op(ev).alias("op"),
            F.col("event_type"),
            F.col("value"),
        )
    ).alias("w")
    return ev.groupBy("user_id").agg(w)


def _lww_live(ev: DataFrame) -> DataFrame:
    return (
        _lww_state(ev)
        .filter(F.col("w.op") != "d")
        .select(
            "user_id",
            F.col("w.event_id").alias("last_event_id"),
            F.col("w.event_type").alias("last_event_type"),
            F.round(F.col("w.value"), 2).alias("last_value"),
        )
    )


_LWW_RANKED_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, ts, event_type, value, {_OP_SQL} AS op FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM ev
)
"""


# ---------------- CDC query family (SURVEY §2 operators) ----------------


def q_cdc_lww_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: deterministic LWW replay — final live row per key."""
    return _lww_live(_events(spark, sf_dir))


def q_cdc_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: config-driven predicate filter, pushed into the parquet scan
    (≙ collection.go:37-50 server-side Find filters)."""
    ev = _events(spark, sf_dir)
    return ev.filter((ev.event_type == "click") & (ev.value >= 250.0)).select(
        "event_id", "user_id", F.round("value", 2).alias("value_r")
    )


def q_cdc_range_scan_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: resume-token range predicate on log position
    (≙ ts >= token, collection.go:57-60; ours is the strict-after
    tuple compare on (ts, event_id))."""
    ev = _events(spark, sf_dir)
    t = F.lit(_TOKEN_TS).cast("timestamp_ntz")
    after = (ev.ts > t) | ((ev.ts == t) & (ev.event_id > 0))
    return ev.filter(after).select("event_id", "user_id", "event_type")


def q_cdc_rate_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: limit/rate cap — first 1000 events past the token in log
    order (≙ FetchCountThreshold, tailer.go:35,61-62)."""
    ev = _events(spark, sf_dir)
    t = F.lit(_TOKEN_TS).cast("timestamp_ntz")
    return (
        ev.filter(ev.ts > t)
        .orderBy("ts", "event_id")
        .limit(1000)
        .select("event_id", "user_id")
    )


def q_cdc_exact_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2-1: exact-duplicate elimination (boundary re-reads)."""
    return _events(spark, sf_dir).select("user_id", "event_type").distinct()


def q_cdc_op_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10: op routing/dispatch counts (i/u/d validation surface)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(_op(ev).alias("op")).agg(F.count("*").alias("n"))


def q_cdc_snapshot_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: snapshot scan row count (≙ dumper_test.go:12-43 seed-100 →
    dump → count==100)."""
    return _events(spark, sf_dir).agg(F.count("*").alias("n_rows"))


def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7-O11: snapshot prefix + MERGE of the suffix ≡ LWW over the
    whole log (the dump-then-tail overlap contract, SURVEY §2.2-4).
    The Spark plan really is two stages merged; the oracle is the
    single-shot replay — equality IS the correctness claim."""
    ev = _events(spark, sf_dir)
    split = F.lit(_SPLIT).cast("timestamp_ntz")
    prefix, suffix = ev.filter(ev.ts < split), ev.filter(ev.ts >= split)
    snap = (
        _lww_state(prefix)
        .filter(F.col("w.op") != "d")
        .select(
            "user_id",
            F.col("w.ts").alias("ts"),
            F.col("w.event_id").alias("event_id"),
            F.col("w.event_type").alias("event_type"),
            F.col("w.value").alias("value"),
        )
    )
    merged = snap.unionByName(
        suffix.select("user_id", "ts", "event_id", "event_type", "value")
    )
    return _lww_live(merged)


def q_cdc_delete_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9: delete-if-present — keys whose final event is a delete."""
    return (
        _lww_state(_events(spark, sf_dir))
        .filter(F.col("w.op") == "d")
        .select("user_id", F.col("w.event_id").alias("deleted_at_event"))
    )


def q_cdc_watch_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18: bounded-run mode — stats over the first 500 events in log
    order (≙ WatchThreshold, tailer.go:34,117-120)."""
    ev = _events(spark, sf_dir)
    first_n = ev.orderBy("ts", "event_id").limit(500)
    return first_n.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


# ---------------- driver contract ----------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW replay of the sf0.001 event log (O13)."""
    return q_cdc_lww_replay(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_replay": q_cdc_lww_replay,
        "cdc_filter_pushdown": q_cdc_filter_pushdown,
        "cdc_range_scan_token": q_cdc_range_scan_token,
        "cdc_rate_cap": q_cdc_rate_cap,
        "cdc_exact_dedupe": q_cdc_exact_dedupe,
        "cdc_op_routing": q_cdc_op_routing,
        "cdc_snapshot_count": q_cdc_snapshot_count,
        "cdc_merge_upsert": q_cdc_merge_upsert,
        "cdc_delete_apply": q_cdc_delete_apply,
        "cdc_watch_threshold": q_cdc_watch_threshold,
    }


def oracle_sql() -> dict[str, str]:
    live_select = (
        "SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, "
        "round(value, 2) AS last_value FROM r WHERE rn = 1 AND op <> 'd'"
    )
    return {
        "cdc_lww_replay": _LWW_RANKED_SQL + live_select,
        "cdc_filter_pushdown": (
            "SELECT event_id, user_id, round(value, 2) AS value_r FROM events "
            "WHERE event_type = 'click' AND value >= 250.0"
        ),
        "cdc_range_scan_token": (
            f"SELECT event_id, user_id, event_type FROM events "
            f"WHERE ts > TIMESTAMP '{_TOKEN_TS}' "
            f"OR (ts = TIMESTAMP '{_TOKEN_TS}' AND event_id > 0)"
        ),
        "cdc_rate_cap": (
            f"SELECT event_id, user_id FROM events WHERE ts > TIMESTAMP '{_TOKEN_TS}' "
            f"ORDER BY ts, event_id LIMIT 1000"
        ),
        "cdc_exact_dedupe": "SELECT DISTINCT user_id, event_type FROM events",
        "cdc_op_routing": (
            f"SELECT {_OP_SQL} AS op, CAST(count(*) AS BIGINT) AS n "
            f"FROM events GROUP BY 1"
        ),
        "cdc_snapshot_count": "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events",
        "cdc_merge_upsert": _LWW_RANKED_SQL + live_select,
        "cdc_delete_apply": (
            _LWW_RANKED_SQL
            + "SELECT user_id, event_id AS deleted_at_event FROM r WHERE rn = 1 AND op = 'd'"
        ),
        "cdc_watch_threshold": (
            "WITH first_n AS (SELECT * FROM events ORDER BY ts, event_id LIMIT 500) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM first_n GROUP BY event_type"
        ),
    }
