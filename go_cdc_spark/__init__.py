"""go_cdc_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of gauravsarma1992/go-cdc (a MongoDB
oplog-tailing replicator, see /root/reference) Spark-first:

- change-event log (insert/update/delete keyed by repo+path+commit)
- snapshot ("dump") then tail with bookmarked resume position
- micro-batched, last-writer-wins conflict resolution
- exactly-once keyed MERGE into a bucketed lake table
- additive schema evolution, per-partition lineage + metrics

Nothing here is a port: the reference's goroutine/channel/ring-buffer
pipeline (reference mongoreplay/tailer.go, buffer.go, query_generator.go)
becomes declarative DataFrame plans + Structured Streaming foreachBatch.
"""

__version__ = "0.1.0"

from go_cdc_spark.config import PipelineConfig  # noqa: F401
