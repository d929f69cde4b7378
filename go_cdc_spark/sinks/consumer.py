"""Checkpointed change-feed consumption — the downstream half of CDC.

``ParquetLakeTable.changes_between`` computes a version-to-version diff;
this module gives each downstream subscriber a durable cursor over it
(≙ consuming an Iceberg/Delta changelog with per-consumer offsets, or
the reference's resume-token loop pointed at OUR table instead of the
oplog — resume_token_store.go:33-58 upgraded to per-consumer files).

Delivery contract — at-least-once, never-skip, deterministic:

- ``poll()`` returns the NET changes between the consumer's last
  acknowledged version and the current latest, plus the version to ack.
- ``ack(version)`` commits the cursor with an atomic rename (crash
  between poll and ack ⇒ the SAME diff is re-delivered; a diff is a
  deterministic function of two manifests, so redelivery is idempotent
  for any consumer that applies it as upserts/deletes).
- Consumers are independent: one offset file per consumer_id.
- First poll with no cursor bootstraps: the full live table is
  delivered as inserts (initial snapshot), acking the version it read.

Scale: poll cost is the ``changes_between`` join (one shuffle over the
bucketed key space); offsets are O(1) driver-side JSON. Consumers must
advance within vacuum retention — ``manifest_at`` raises loudly when a
base version has been expired, same as Iceberg incremental reads.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, functions as F

from go_cdc_spark.sinks.lake import ParquetLakeTable


class ChangeFeedConsumer:
    def __init__(self, lake: ParquetLakeTable, offsets_root: str, consumer_id: str):
        self.lake = lake
        self.consumer_id = consumer_id
        os.makedirs(offsets_root, exist_ok=True)
        self._path = os.path.join(offsets_root, f"{consumer_id}.json")

    def acked_version(self) -> int | None:
        if not os.path.exists(self._path):
            return None
        with open(self._path) as fh:
            return json.load(fh)["version"]

    def poll(self) -> tuple[DataFrame, int]:
        """(changes, version_to_ack). ``changes`` has the
        ``changes_between`` shape: key cols, change_type, post-image
        payload; empty when the consumer is already at the latest
        version. Does NOT advance the cursor — call :meth:`ack`."""
        latest = self.lake.latest_version()
        m_new = self.lake.manifest_at(latest)
        base = self.acked_version()
        if base is None:
            # initial snapshot: everything live is an insert
            keys = m_new["key_cols"]
            snap = self.lake.read(manifest=m_new)
            payload = [c for c in snap.columns if c not in set(keys)]
            return (
                snap.select(
                    *keys, F.lit("insert").alias("change_type"), *payload
                ),
                latest,
            )
        if base == latest:
            m = m_new  # empty frame with the changes schema
            empty = self.lake.changes_between(m, m).limit(0)
            return empty, latest
        return self.lake.changes_between(self.lake.manifest_at(base), m_new), latest

    def ack(self, version: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self._path), suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump({"consumer_id": self.consumer_id, "version": version}, fh)
        os.replace(tmp, self._path)  # atomic cursor commit
