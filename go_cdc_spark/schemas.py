"""Canonical schemas for the CDC engine.

The reference is schemaless (``map[string]interface{}``,
reference mongoreplay/message.go:11); we use the fixed typed schema the
driver contract demands (BASELINE.json input_hint):

- change event  ≙ MessageN   (mongoreplay/message.go:9-21)
- lake table    ≙ destination collection
- bookmark row  ≙ ResumeTokenStore (resume_token_store.go:16-19)
                 + Stage records  (stage_tracker.go:23-32)

MongoDB's ``primitive.Timestamp{T, I}`` (unix-seconds, intra-second
ordinal) becomes the ``(ts_t, ts_i)`` long pair; total order is
lexicographic, matching the oplog. ``seq`` is a generator-assigned
globally monotone id used as a deterministic tie-break (the reference
relies on single-threaded in-order apply instead,
query_generator.go:78-85).
"""

from __future__ import annotations

from pyspark.sql import types as T

# op ∈ {i, u, d}  (message.go:17-21); anything else must raise
# (query_generator.go:39-48).
INSERT_OP = "i"
UPDATE_OP = "u"
DELETE_OP = "d"
VALID_OPS = (INSERT_OP, UPDATE_OP, DELETE_OP)

KEY_COLS = ["repo", "path", "commit"]
ORDER_COLS = ["ts_t", "ts_i", "seq"]
PAYLOAD_COLS = ["lang", "content"]

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("ts_t", T.LongType(), False),
        T.StructField("ts_i", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),  # null when op='d'
        T.StructField("content", T.StringType(), True),  # null when op='d'
    ]
)

# Additive schema evolution: events from a later epoch may carry extra
# nullable payload columns (e.g. content_sha). EVENT_SCHEMA is the
# *minimum* schema; see go_cdc_spark/evolve.py.
EVOLVED_EVENT_SCHEMA = T.StructType(
    EVENT_SCHEMA.fields + [T.StructField("content_sha", T.StringType(), True)]
)

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

# Bookmark / lineage row (FIXTURES.md F3). One row per
# (pipeline, epoch, partition); partition_id = -1 aggregates the epoch.
BOOKMARK_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_id", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("ts_t", T.LongType(), False),
        T.StructField("ts_i", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("event_count", T.LongType(), False),
        T.StructField("stage", T.StringType(), False),  # init|snapshot|tail
        T.StructField("status", T.StringType(), False),  # pending|success|failed
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

ZERO_TOKEN = (0, 0, -1)  # (ts_t, ts_i, seq): missing bookmark ⇒ start from zero
#                          (≙ tailer_manager.go:123-125: missing file ⇒ zero token)
