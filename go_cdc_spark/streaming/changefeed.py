"""Structured-Streaming change-feed publisher: tail OUR OWN table's
commit log and publish per-version changelogs downstream.

The batch half of the CDF story is ``changes_between`` (version diff)
and ``ChangeFeedConsumer`` (poll/ack cursor). This module closes the
loop Spark-first: the lake's ``_commits/`` directory IS an append-only
log of tiny JSON manifests, so ``spark.readStream`` with a file source
discovers new commits exactly-once (file-source offsets live in the
stream checkpoint), and ``foreachBatch`` turns each newly discovered
version into a distributed ``changes_between(v-1, v)`` diff written to
``out_path/version=N/``.

Delivery: the per-version output write is mode("overwrite") into its
own ``version=N`` directory, so a foreachBatch retry (at-least-once)
republishes the identical rows instead of duplicating — idempotent
publication, exactly-once in effect for any reader that lists version
directories.

Scale: the streamed rows are manifests (one tiny JSON per commit —
metadata, never data); each diff is the usual one-shuffle key join.
``Trigger.AvailableNow`` drains the backlog and stops — the pattern for
scheduled incremental publication; a continuous trigger tails live.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F, types as T

from go_cdc_spark.sinks.lake import ParquetLakeTable

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType()),
        T.StructField("epoch_key", T.StringType()),
    ]
)


def stream_change_feed(
    spark: SparkSession,
    table_root: str,
    checkpoint_dir: str,
    out_path: str,
    available_now: bool = True,
):
    """Publish per-version changelogs for every commit the stream has
    not yet seen. Returns the started StreamingQuery (call
    ``awaitTermination()``; with ``available_now`` it drains the
    current backlog and stops)."""
    lake = ParquetLakeTable.load(spark, table_root)

    def _marker(version_dir: str, name: str, body: str) -> None:
        # underscore-prefixed: invisible to the parquet reader in
        # read_change_feed, visible to anyone auditing the feed
        os.makedirs(version_dir, exist_ok=True)
        with open(os.path.join(version_dir, name), "w") as fh:
            fh.write(body)

    def publish(batch_df, _batch_id):
        versions = sorted(
            r["version"] for r in batch_df.select("version").collect()
        )
        for v in versions:
            if v < 1:
                continue  # v0 is table creation (empty), nothing to diff
            vdir = os.path.join(out_path, f"version={v}")
            # vacuum() may have expired either manifest while the
            # stream lagged ("consumers must outrun vacuum retention",
            # manifest_at). A hard raise here would wedge the stream
            # permanently — it re-fails on the same offset range at
            # every restart — so degrade per the contract instead:
            try:
                m_new = lake.manifest_at(v)
            except FileNotFoundError:
                # the version itself is gone: nothing reconstructable —
                # log-and-skip with an explicit marker
                _marker(vdir, "_SKIPPED_VACUUMED.txt",
                        f"version {v} manifest expired by vacuum; diff lost\n")
                continue
            snapshot_fallback = False
            try:
                ch = lake.changes_between(lake.manifest_at(v - 1), m_new)
            except FileNotFoundError:
                # base expired: publish the full v-snapshot as inserts
                # (same schema as the diff) + an explicit marker, so a
                # consumer can rebuild state from here
                snapshot_fallback = True
                keys = m_new["key_cols"]
                schema_fields = lake.read(manifest=m_new).columns
                payload = [c for c in schema_fields if c not in set(keys)]
                ch = lake.read(manifest=m_new).select(
                    *keys, F.lit("insert").alias("change_type"), *payload
                )
            (
                ch.write.mode("overwrite")  # idempotent per-version dir
                .parquet(vdir)
            )
            if snapshot_fallback:  # after the write — overwrite wipes the dir
                _marker(vdir, "_FULL_SNAPSHOT.txt",
                        f"base manifest v{v - 1} expired by vacuum; "
                        f"published full snapshot of v{v} as inserts\n")

    # glob pins the source to committed manifests only — the dir also
    # holds epoch-rollup .txt files and in-flight .tmp renames
    reader = (
        spark.readStream.schema(_MANIFEST_SCHEMA)
        .json(os.path.join(table_root, "_commits", "v*.json"))
    )
    writer = (
        reader.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_change_feed(spark: SparkSession, out_path: str):
    """Read everything published so far, with its ``version`` column
    (basePath-partitioned discovery)."""
    return (
        spark.read.option("basePath", out_path)
        .parquet(out_path)
    )
