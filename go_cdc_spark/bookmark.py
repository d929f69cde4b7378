"""Bookmark / lineage store.

≙ ResumeTokenStore (reference mongoreplay/resume_token_store.go:11-58)
+ Stage records (stage_tracker.go:23-52), with the reference's two
defects fixed (SURVEY §2.2-5): the store is keyed by ``pipeline_id``
(the reference shares one global file across all collections), and a
missing store yields the zero token instead of crashing
(≙ tailer_manager.go:123-125 — that part the reference got right).

One JSON file per epoch, atomic-rename committed::

    bookmark_root/{pipeline_id}/epoch-{E:012d}.json

Each file carries the epoch's high-water mark (ts_t, ts_i, seq), stage,
status, per-partition (bucket) lineage counts, and metrics. The store
is driver-side metadata — O(epochs) tiny files — while the *source of
truth* for exactly-once is the lake table's own committed-epoch list;
the bookmark store adds lineage + metrics + the resume position, and
``latest_token`` survives a crash between table commit and bookmark
write because replay double-checks the table's epoch list.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field

from go_cdc_spark import schemas


@dataclass
class BookmarkRow:
    pipeline_id: str
    epoch: int
    ts_t: int
    ts_i: int
    seq: int
    stage: str  # init | snapshot | tail
    status: str  # pending | success | failed
    event_count: int = 0
    partition_counts: dict[str, int] = field(default_factory=dict)  # bucket -> rows
    metrics: dict[str, float] = field(default_factory=dict)
    committed_at: float = 0.0


class BookmarkStore:
    def __init__(self, root: str, pipeline_id: str):
        self.dir = os.path.join(root, pipeline_id)
        self.pipeline_id = pipeline_id
        os.makedirs(self.dir, exist_ok=True)

    def record(self, row: BookmarkRow) -> None:
        row.committed_at = row.committed_at or time.time()
        target = os.path.join(self.dir, f"epoch-{row.epoch:012d}.json")
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(asdict(row), fh)
        os.replace(tmp, target)  # atomic; idempotent re-record overwrites

    def _epoch_files(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            f for f in os.listdir(self.dir) if f.startswith("epoch-") and f.endswith(".json")
        )

    def rows(self) -> list[BookmarkRow]:
        out = []
        for f in self._epoch_files():
            with open(os.path.join(self.dir, f)) as fh:
                out.append(BookmarkRow(**json.load(fh)))
        return out

    def latest_token(self) -> tuple[int, int, int]:
        """Highest applied (ts_t, ts_i, seq); missing store ⇒ zero token
        (≙ tailer_manager.go:123-125)."""
        best = schemas.ZERO_TOKEN
        for r in self.rows():
            if r.status == "success":
                best = max(best, (r.ts_t, r.ts_i, r.seq))
        return best

    def committed_epochs(self) -> set[int]:
        return {r.epoch for r in self.rows() if r.status == "success"}

    def to_dataframe(self, spark):
        """Lineage as a DataFrame (one row per epoch×partition)."""
        recs = []
        for r in self.rows():
            parts = r.partition_counts or {"-1": r.event_count}
            for pid, n in parts.items():
                recs.append(
                    (
                        r.pipeline_id,
                        r.epoch,
                        r.ts_t,
                        r.ts_i,
                        r.seq,
                        int(pid),
                        n,
                        r.stage,
                        r.status,
                        __import__("datetime").datetime.fromtimestamp(r.committed_at),
                    )
                )
        return spark.createDataFrame(recs, schema=schemas.BOOKMARK_SCHEMA)
