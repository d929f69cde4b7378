"""Lake sink: MERGE semantics, epoch idempotence, bucket pruning,
schema evolution. ≙ dumper/query_generator reference tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from go_cdc_spark import schemas
from go_cdc_spark.operators.resolve import lww_resolve
from go_cdc_spark.sinks.lake import ParquetLakeTable

K, O, P = schemas.KEY_COLS, schemas.ORDER_COLS, schemas.PAYLOAD_COLS


def _events(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.EVENT_SCHEMA)


def _resolved(spark, rows):
    return lww_resolve(_events(spark, rows), K, O, P)


def _row(op, seq, key, content="x"):
    r, p, c = key
    lang, cont = (None, None) if op == "d" else ("py", content)
    return (op, 1_700_000_000, seq, seq, r, p, c, lang, cont)


def _table(spark, root, n_buckets=8):
    return ParquetLakeTable.create(spark, root, schemas.TABLE_SCHEMA, K, n_buckets)


def test_apply_insert_update_delete(spark, tmpdir_path):
    t = _table(spark, tmpdir_path)
    t.apply_batch(_resolved(spark, [_row("i", 1, ("r1", "p", "c"), "v1"),
                                    _row("i", 2, ("r2", "p", "c"), "v2")]), "e1")
    assert {r["content"] for r in t.read().collect()} == {"v1", "v2"}
    t.apply_batch(_resolved(spark, [_row("u", 3, ("r1", "p", "c"), "v1b"),
                                    _row("d", 4, ("r2", "p", "c"))]), "e2")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v1b"


def test_epoch_idempotence(spark, tmpdir_path):
    t = _table(spark, tmpdir_path)
    b = _resolved(spark, [_row("i", 1, ("r1", "p", "c"), "v1")])
    s1 = t.apply_batch(b, "e1")
    s2 = t.apply_batch(_resolved(spark, [_row("u", 9, ("r1", "p", "c"), "OVERWRITTEN")]), "e1")
    assert s1.applied and not s2.applied
    assert t.read().collect()[0]["content"] == "v1"  # replay was a no-op


def test_bucket_pruning_rewrites_only_affected(spark, tmpdir_path):
    t = _table(spark, tmpdir_path, n_buckets=16)
    big = _resolved(spark, [_row("i", i, (f"r{i}", "p", "c"), f"v{i}") for i in range(100)])
    t.apply_batch(big, "e1")
    m1 = t.manifest()
    t.apply_batch(_resolved(spark, [_row("u", 1000, ("r0", "p", "c"), "new")]), "e2")
    m2 = t.manifest()
    moved = [b for b in m1["buckets"] if m1["buckets"][b] != m2["buckets"][b]]
    assert len(moved) == 1  # exactly the touched bucket was rewritten
    untouched = [b for b in m1["buckets"] if b not in moved]
    assert all(m2["buckets"][b] == m1["buckets"][b] for b in untouched)
    assert t.read().filter("repo='r0'").collect()[0]["content"] == "new"
    # read with bucket pruning returns the same rows as a full read
    ib = int(moved[0])
    pruned = t.read(buckets=[ib]).count()
    assert pruned == m2["bucket_counts"][moved[0]]


def test_delete_everything_empties_table(spark, tmpdir_path):
    t = _table(spark, tmpdir_path, n_buckets=4)
    t.apply_batch(_resolved(spark, [_row("i", i, (f"r{i}", "p", "c")) for i in range(10)]), "e1")
    t.apply_batch(_resolved(spark, [_row("d", 100 + i, (f"r{i}", "p", "c")) for i in range(10)]), "e2")
    assert t.read().count() == 0
    # deletes persist as tombstones (order-aware shield against
    # out-of-order resurrection), so the buckets stay populated
    tombs = t.read(internal=True)
    assert tombs.count() == 10 and tombs.filter("op != 'd'").count() == 0


def test_schema_evolution_adds_nullable_column(spark, tmpdir_path):
    t = _table(spark, tmpdir_path)
    t.apply_batch(_resolved(spark, [_row("i", 1, ("r1", "p", "c"), "old")]), "e1")
    evolved = _events(spark, [_row("i", 2, ("r2", "p", "c"), "new")]).withColumn(
        "content_sha", F.sha2(F.coalesce("content", F.lit("")), 256)
    )
    t.apply_batch(lww_resolve(evolved, K, O, P + ["content_sha"]), "e2")
    out = {r["repo"]: r.asDict() for r in t.read().collect()}
    assert "content_sha" in out["r1"] and out["r1"]["content_sha"] is None
    assert out["r2"]["content_sha"] is not None
    assert [f.name for f in t.schema.fields][-1] == "content_sha"


def test_crash_retry_overwrites_orphan_data_dir(spark, tmpdir_path):
    t = _table(spark, tmpdir_path)
    # simulate a crashed attempt: data dir exists, manifest does not
    orphan = os.path.join(tmpdir_path, "data", "v1")
    os.makedirs(os.path.join(orphan, "bucket=0"), exist_ok=True)
    s = t.apply_batch(_resolved(spark, [_row("i", 1, ("r1", "p", "c"), "v1")]), "e1")
    assert s.applied and t.read().count() == 1
