"""Property-based tests (hypothesis): the LWW/MERGE contract holds for
ARBITRARY event sequences — redeliveries, hot keys, delete/rebirth
chains, permuted arrival order — not just the fixtures. The oracle is
the independent single-node pandas replay (go_cdc_spark/oracle.py),
mirroring the reference's semantic contract (SURVEY §2.2)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from go_cdc_spark import oracle, schemas
from go_cdc_spark.operators.resolve import lww_resolve

K, O, P = list(schemas.KEY_COLS), list(schemas.ORDER_COLS), list(schemas.PAYLOAD_COLS)

_ops = st.sampled_from(["i", "u", "d"])
_keys = st.tuples(
    st.sampled_from(["r1", "r2", "hot"]),
    st.sampled_from(["a", "b"]),
    st.sampled_from(["c1"]),
)
_content = st.text(alphabet="xyz", min_size=0, max_size=4)


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        op = draw(_ops)
        r, p, c = draw(_keys)
        lang, content = (None, None) if op == "d" else ("py", draw(_content))
        # ts_t from a tiny domain so multiple events per key contend;
        # seq = i keeps the order tuple a total order (genlog contract)
        rows.append((op, draw(st.integers(0, 3)), draw(st.integers(0, 1)), i,
                     r, p, c, lang, content))
    # redelivery: duplicate a subset of events verbatim (at-least-once
    # delivery must not change the outcome)
    for idx in draw(st.lists(st.integers(0, n - 1), max_size=5)):
        rows.append(rows[idx])
    return rows


def _spark_result(spark, rows):
    df = spark.createDataFrame(rows, schema=schemas.EVENT_SCHEMA)
    out = lww_resolve(df, K, O, P).filter("op != 'd'").select(*K, *P)
    return (
        out.toPandas()
        .sort_values(K, kind="mergesort")
        .reset_index(drop=True)
        .fillna("∅")
    )


def _oracle_result(rows):
    pdf = pd.DataFrame(rows, columns=["op", *O, *K, *P])
    got = oracle.replay_oracle(pdf, K, O, P)
    return got[[*K, *P]].reset_index(drop=True).fillna("∅")


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_logs(), seed=st.integers(0, 2**31 - 1))
def test_lww_resolve_matches_oracle_on_any_log(spark, rows, seed):
    """For any event sequence (with redeliveries), the distributed
    max-struct LWW reduce equals the sequential sorted replay, and the
    result is invariant under arrival-order permutation (max is a
    commutative, associative, idempotent reduce)."""
    got = _spark_result(spark, rows)
    want = _oracle_result(rows)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # permute arrival order deterministically from the drawn seed
    import random

    perm = rows[:]
    random.Random(seed).shuffle(perm)
    got_perm = _spark_result(spark, perm)
    pd.testing.assert_frame_equal(got_perm, want, check_dtype=False)
