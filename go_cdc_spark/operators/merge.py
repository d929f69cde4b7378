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
(SURVEY §2 O7-O11). Implemented as union + LWW re-reduce where current
rows carry an order tuple smaller than every event's, so any batch row
beats the stored row — one shuffle, no join, fully codegen'd.
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
) -> DataFrame:
    """Merge a LWW-resolved batch into the current table state.

    ``current``: key_cols + payload_cols (table rows).
    ``resolved_batch``: key_cols + order_cols + op + payload_cols
    (output of lww_resolve — one row per key).
    Returns the new table state: key_cols + payload_cols.
    """
    cur = current.select(
        *key_cols,
        # order tuple strictly below any real event ⇒ stored row loses
        # to any batch event for the same key (update-as-replace).
        F.lit(-1).cast("long").alias(order_cols[0]),
        *[F.lit(-1).cast("long").alias(c) for c in order_cols[1:]],
        F.lit(schemas.UPDATE_OP).alias("op"),
        *payload_cols,
    )
    batch = resolved_batch.select(
        *key_cols, *[F.col(c).cast("long") for c in order_cols], "op", *payload_cols
    )
    merged = lww_resolve(
        cur.unionByName(batch),
        key_cols,
        order_cols,
        payload_cols,
        validate=False,  # batch already validated at resolve time
    )
    # Winner op 'd' ⇒ key deleted (delete-if-present); a 'd' winning over
    # an absent key is the reference's silent no-op DeleteOne.
    return merged.filter(F.col("op") != schemas.DELETE_OP).select(*key_cols, *payload_cols)
