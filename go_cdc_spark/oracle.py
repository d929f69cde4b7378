"""Trivially-correct pandas oracle for replay verification.

Small enough to be obviously right (SURVEY §5): group events by key,
take the max-(ts_t, ts_i, seq) event, drop deletes. Used by pytest to
check the distributed engine's final table state, including the per-row
content sha256 invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def replay_oracle(
    events: pd.DataFrame,
    key_cols=("repo", "path", "commit"),
    order_cols=("ts_t", "ts_i", "seq"),
    payload_cols=("lang", "content"),
) -> pd.DataFrame:
    """Final table state after replaying all events, per the LWW/MERGE
    contract (SURVEY §2.2). Deterministic; O(n log n) single-node."""
    df = events.sort_values(list(order_cols), kind="mergesort")
    last = df.groupby(list(key_cols), as_index=False).tail(1)
    live = last[last["op"] != "d"]
    cols = list(key_cols) + [c for c in payload_cols if c in live.columns]
    extra = [c for c in live.columns if c not in cols + ["op", *order_cols]]
    return (
        live[cols + extra]
        .sort_values(list(key_cols), kind="mergesort")
        .reset_index(drop=True)
    )


def content_sha256(df: pd.DataFrame, col: str = "content") -> pd.Series:
    return df[col].map(
        lambda s: hashlib.sha256(s.encode()).hexdigest() if isinstance(s, str) else None
    )


def table_fingerprint(df: pd.DataFrame, key_cols=("repo", "path", "commit")) -> str:
    """Order-insensitive whole-table digest over key + content sha256.

    The correctness metric: two replays match iff fingerprints match.
    """
    d = df.copy()
    d["_sha"] = content_sha256(d) if "content" in d.columns else ""
    rows = sorted(
        "|".join(str(d.iloc[i][c]) for c in (*key_cols, "_sha")) for i in range(len(d))
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()
