"""Physical-plan inspection helpers.

The reference pushes its filters server-side into Mongo ``Find()``
queries (reference mongoreplay/dumper.go:62-66, collection.go:52-66);
our equivalent guarantee is that Catalyst pushes predicates and column
pruning into the parquet scan. These helpers make that guarantee
testable — tests assert on the formatted plan instead of hoping.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    return "\n".join(
        ln.strip()
        for ln in formatted_plan(df).splitlines()
        if "PushedFilters" in ln
    )


def read_schema(df: DataFrame) -> str:
    """The ReadSchema section(s) — column-pruning evidence."""
    return "\n".join(
        ln.strip() for ln in formatted_plan(df).splitlines() if "ReadSchema" in ln
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def reads_only_columns(df: DataFrame, columns: set[str]) -> bool:
    """True if every scan's ReadSchema is a subset of ``columns``."""
    import re

    for ln in read_schema(df).splitlines():
        m = re.search(r"struct<([^>]*)>", ln)
        if not m:
            continue
        fields = {f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()}
        if not fields <= columns:
            return False
    return True


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (wider = more JVM-fused)."""
    import re

    from pyspark.sql import functions as F

    # AQE wraps the plan in AdaptiveSparkPlan, which reports 0 codegen
    # subtrees until execution — re-plan with AQE off (the non-adaptive
    # plan shows the same codegen fusing the final adaptive plan gets).
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        fresh = df.filter(F.lit(True))  # new QueryExecution under the new conf
        buf = io.StringIO()
        with redirect_stdout(buf):
            fresh.explain("codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    return int(m.group(1)) if m else 0


def shuffle_count(df: DataFrame) -> int:
    """Exchange nodes in the plan — every one is a full shuffle.

    Counts the numbered node-detail headers (``(5) Exchange``) so each
    node is counted once, not once per tree line + detail section.
    """
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.M))
