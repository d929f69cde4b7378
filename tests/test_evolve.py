"""Additive schema evolution: union_schema rules and the two
equivalent alignment paths (Column exprs vs Arrow mapInArrow)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from go_cdc_spark.evolve import align_to_schema, align_with_arrow, union_schema

TARGET = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),  # missing from input → null
    ]
)


def test_union_schema_additive_and_conflict():
    base = T.StructType([T.StructField("a", T.LongType())])
    inc = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("z", T.StringType())]
    )
    out = union_schema(base, inc)
    assert [f.name for f in out.fields] == ["a", "z"]
    assert out["z"].nullable
    bad = T.StructType([T.StructField("a", T.StringType())])
    with pytest.raises(TypeError, match="non-additive"):
        union_schema(base, bad)


def test_column_and_arrow_alignment_agree(spark):
    # input: wrong column order, missing column c
    df = spark.createDataFrame([("x", 7), ("y", 8)], ["b", "a"])
    via_cols = align_to_schema(df, TARGET).collect()
    via_arrow = align_with_arrow(df, TARGET).collect()
    assert sorted(via_cols) == sorted(via_arrow)
    r = sorted(via_cols)[0]
    assert (r["a"], r["b"], r["c"]) == (7, "x", None)
    assert align_with_arrow(df, TARGET).schema == TARGET
