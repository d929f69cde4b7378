"""Profile the driver correctness loop: per-query Spark and DuckDB oracle
wall time at sf0.01, in registry order. Prints a JSONL row per query so we
can see where the driver's 59-row loop burns its budget."""
from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("profile-correctness")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    t_total0 = time.time()
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        err = None
        nrows = -1
        try:
            pdf = q(spark, SF_DIR).toPandas()
            nrows = len(pdf)
        except Exception as e:  # noqa: BLE001
            err = repr(e)[:200]
        t_spark = time.time() - t0
        t0 = time.time()
        o_rows = -1
        o_err = None
        if name in sqls:
            try:
                o_rows = len(con.execute(sqls[name]).fetchdf())
            except Exception as e:  # noqa: BLE001
                o_err = repr(e)[:200]
        t_duck = time.time() - t0
        print(
            json.dumps(
                {
                    "q": name,
                    "spark_s": round(t_spark, 2),
                    "duck_s": round(t_duck, 2),
                    "rows": nrows,
                    "o_rows": o_rows,
                    "err": err,
                    "o_err": o_err,
                    "cum_s": round(time.time() - t_total0, 1),
                }
            ),
            flush=True,
        )
    print(json.dumps({"total_s": round(time.time() - t_total0, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
