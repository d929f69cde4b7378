"""Keyed MERGE semantics as a pure DataFrame transformation.

≙ the reference's per-event apply fns collapsed into one set operation
(reference mongoreplay/query_generator.go:50-63):
  - insert-if-absent   (InsertOne; dup-key error swallowed ⇒ no-op)
  - update-as-full-row-replace (UpdateOne {$set: full doc})
  - delete-if-present  (DeleteOne; 0 matches ⇒ no-op)

i.e. ``MERGE INTO t USING batch ON key
       WHEN MATCHED AND op='d' THEN DELETE
       WHEN MATCHED THEN UPDATE SET *
       WHEN NOT MATCHED AND op!='d' THEN INSERT *``
(SURVEY §2 O7-O11) — upgraded to *order-aware* LWW: stored rows keep
their event-order tuple (ts_t, ts_i, seq) and deletes persist as
tombstones, so a stored row only loses to a batch event that is
actually NEWER. The reference gets ordering for free from
single-threaded in-order apply (query_generator.go:78-85); a
distributed replay cannot assume that — micro-batches may split a
poll window, arrive out of order across epochs, or re-deliver — so
the order tuple must live in the table. (This is the same design as
Cassandra LWW cells / Delta CDF appliers.)

Implemented as union + LWW re-reduce: one shuffle, no join, fully
codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from go_cdc_spark import schemas
from go_cdc_spark.operators.resolve import lww_resolve


def merge_resolved(
    current: DataFrame,
    resolved_batch: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    salt_partitions: int | None = None,
) -> DataFrame:
    """Merge a batch of events into the current *internal* state.

    ``current``: key_cols + order_cols + op + payload_cols (stored
    rows incl. tombstones; legacy inputs without order_cols/op are
    stamped with order=-1 / op='u', i.e. "lose to any event").
    ``resolved_batch``: key_cols + order_cols + op + payload_cols —
    either pre-reduced (one row per key) or RAW events: max-struct is
    associative, so union + one reduce gives the identical result and
    pre-reducing would only add a redundant shuffle.
    Returns the new internal state (one row per key, tombstones
    retained with op='d'). Filter ``op != 'd'`` for the live view.
    ``salt_partitions`` enables the two-phase salted reduce for
    pathological hot keys (≙ lww_resolve).
    """
    cur_cols = set(current.columns)
    for c in order_cols:
        if c not in cur_cols:
            current = current.withColumn(c, F.lit(-1).cast("long"))
    if "op" not in cur_cols:
        current = current.withColumn("op", F.lit(schemas.UPDATE_OP))
    cur = current.select(
        *key_cols, *[F.col(c).cast("long") for c in order_cols], "op", *payload_cols
    )
    batch = resolved_batch.select(
        *key_cols, *[F.col(c).cast("long") for c in order_cols], "op", *payload_cols
    )
    return lww_resolve(
        cur.unionByName(batch),
        key_cols,
        order_cols,
        payload_cols,
        salt_partitions=salt_partitions,
        validate=False,  # batch op validity enforced upstream (checked_op)
    )
