"""As-of (temporal) join — an operator Spark lacks natively.

For every left row, attach the payload of the LATEST right row with
``right.ts <= left.ts`` in the same key group (the point-in-time lookup
a CDC consumer needs: "what was the dimension state when this event
happened?"). The reference has no joins at all (SURVEY §2.3); this is
an engine extension, oracle-checked against DuckDB's native ASOF JOIN.

Implementation is the union + ordered-window trick, NOT a range join:

1. union both sides, tagged ``_side`` (right=0, left=1) with each
   other's columns null-padded;
2. one window per key ordered by (ts, _side, tiebreak...):
   ``last(right_payload, ignorenulls=True)`` over rows from the start
   of the key group through the current row carries the most recent
   right value forward onto every left row;
3. keep only left rows.

Scale shape: exactly ONE shuffle (the window's hash partition on key) —
no O(|L|·|R|) range-join blowup, no broadcast requirement on either
side. Skewed keys behave like any windowed aggregate (AQE handles
residual skew). Right-side ties on (key, ts) are broken by
``tiebreak_cols`` (latest wins), keeping the result deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: ``left`` rows + latest at-or-before ``right``
    payload per key. Left rows with no prior right row get nulls
    (LEFT-join semantics). ``right`` may carry multiple rows per
    (key, ts); the winner is the last by ``tiebreak_cols``.

    Contract: right payload values must be non-null — the carry-forward
    is ``last(ignorenulls)`` per column, so a null in a newer right row
    would read through to the previous non-null value (and columns
    would carry forward independently). Wrap nullable payloads in a
    sentinel/struct on the caller side if "explicit null overwrites"
    semantics are needed."""
    key_cols = list(key_cols)
    payload_cols = list(payload_cols)
    tiebreak_cols = list(tiebreak_cols)
    l_cols = left.columns
    clash = set(payload_cols) & set(l_cols)
    if clash:
        raise ValueError(
            f"asof_join: payload column(s) {sorted(clash)} already exist "
            "on the left side — alias them on one side first"
        )
    r = right.select(
        *key_cols,
        ts_col,
        *tiebreak_cols,
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    ).withColumn(_SIDE, F.lit(0))
    l = left.withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left at equal ts (<= semantics); right
    # ties resolve by tiebreak order (latest wins via last())
    order = [F.col(ts_col), F.col(_SIDE)] + [F.col(c) for c in tiebreak_cols]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attached = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c) for c in payload_cols
    ]
    return u.select(*l_cols, _SIDE, *attached).filter(F.col(_SIDE) == 1).drop(_SIDE)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval (range) join: inner-join every left row to every right
    interval with ``start <= ts <= end`` in the same key group.

    Spark plans a raw inequality join as BroadcastNestedLoopJoin /
    CartesianProduct — O(|L|·|R|) and a broadcast requirement. This
    operator turns it into an EQUI-join: each right interval explodes
    into the fixed-width time buckets it covers (``sequence`` — JVM-
    side, ≈ interval_len / bucket_width rows), each left row maps to
    exactly ONE bucket, and the join key becomes (key…, bucket) with a
    residual BETWEEN filter. A (ts, interval) pair can meet in only one
    bucket — the left row's — so no dedup pass is needed. Work is
    O(|L| + Σ interval_len/width) shuffled rows through one hash join;
    pick ``bucket_width`` near the typical interval length so intervals
    explode into O(1) buckets.

    ``bucket_width=None`` (default) derives it as the MEDIAN interval
    length (one cheap approx-percentile agg over the right side) — a
    caller-supplied width far below typical interval length would
    explode each interval into thousands of bucket rows; the median
    pins per-interval fan-out at ~2 buckets for the typical interval
    regardless of the unit (seconds vs millis vs plain longs) the
    caller's timestamps use.
    """
    key_cols = list(key_cols)
    if bucket_width is None:
        med = right.select(
            F.percentile_approx(
                F.col(end_col).cast("long") - F.col(start_col).cast("long"),
                0.5,
            )
        ).first()[0]
        bucket_width = max(int(med or 0), 1)
    clash = (set(left.columns) & set(right.columns)) - set(key_cols)
    if clash:
        raise ValueError(
            f"range_join: non-key column(s) {sorted(clash)} exist on both "
            "sides — alias them on one side first (the join would emit "
            "ambiguous duplicates)"
        )
    w = F.lit(bucket_width).cast("long")
    l = left.withColumn("_bk", (F.col(ts_col).cast("long") / w).cast("long"))
    r = right.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("long") / w).cast("long"),
                (F.col(end_col).cast("long") / w).cast("long"),
            )
        ),
    )
    joined = l.join(r, on=key_cols + ["_bk"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_bk")
