#!/usr/bin/env python
"""Exact-vs-LSH near-dup crossover evidence.

The sf0.1 embeddings fixture (N=2k, pairs at cos≈0.45) is BELOW the
regime LSH exists for: at 2k vectors one GEMM scores all 2M pairs in
well under a second, and θ≈63° is where hyperplane LSH's ρ-exponent is
worst, so the exact operator wins the benched entry and the recorded
number alone reads like "the LSH loses to exhaustive search".

This harness measures where the operators actually trade places, at
the operating point large-corpus dedup really uses (threshold 0.9,
SemDeDup/near-dup regime — arXiv:2303.09540 prunes at cos≥0.9x):
a deterministic synthetic corpus (hash-seeded per-partition normals,
1%% planted near-dup pairs at cos≥0.93) is swept over N with BOTH
operators timed on the same session, same input, and LSH recall on the
planted pairs asserted ≥0.9 — a fast approximate pass that misses the
dups would be cheating, not winning.

Emits one JSON line per (N, operator) with wall seconds + candidate
stats, then a summary line. Run AFTER the correctness suite — this is
a perf artifact, not a gate. ~10 min at the default sweep on local[32].

Usage:
    python BENCH/lsh_crossover.py [--ns 25000,100000,250000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
THRESHOLD = 0.9
PLANT_EVERY = 50  # one planted near-dup pair per 100 rows (ids 2g, 2g+1)
SEED = 1234


def make_corpus(spark, n: int):
    """Deterministic synthetic embeddings, generated DISTRIBUTED.

    Row ids pair up as (2g, 2g+1). Every PLANT_EVERY-th group's odd
    member is its even partner plus small noise (cos ≥ ~0.93 — above
    THRESHOLD); all other vectors are independent normals. Each Arrow
    batch regenerates its rows from a per-row-id seed stream, so the
    corpus is identical regardless of partitioning or retries (the
    same recipe genlog.py uses, in numpy instead of xxhash64 columns).
    """
    from pyspark.sql import functions as F, types as T

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            groups = ids // 2
            # base vector of a group: seeded by the group id
            # (Philox streams are cheap to key per row)
            base = np.vstack(
                [
                    np.random.default_rng((SEED, int(g))).standard_normal(DIM)
                    for g in groups
                ]
            )
            odd = ids % 2 == 1
            planted = odd & (groups % PLANT_EVERY == 0)
            indep = odd & ~planted
            # independent odd rows: their own stream, offset keyspace
            if indep.any():
                base[indep] = np.vstack(
                    [
                        np.random.default_rng((SEED + 1, int(i))).standard_normal(DIM)
                        for i in ids[indep]
                    ]
                )
            if planted.any():
                noise = np.vstack(
                    [
                        np.random.default_rng((SEED + 2, int(i))).standard_normal(DIM)
                        for i in ids[planted]
                    ]
                )
                # ~0.38 noise-to-signal in L2 → cos ≈ 0.93-0.96 at dim 64
                base[planted] = base[planted] + 0.3 * noise
            yield pd.DataFrame({"vec_id": ids, "embedding": list(base)})

    n_part = max(8, n // 25_000)
    return (
        spark.range(0, n, 1, n_part)
        .select(F.col("id"))
        .mapInPandas(gen, schema=out_schema)
    )


def planted_pairs(n: int) -> set[tuple[int, int]]:
    return {
        (2 * g, 2 * g + 1)
        for g in range(0, n // 2, PLANT_EVERY)
        if 2 * g + 1 < n
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="25000,100000,250000")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--exact-max", type=int, default=25_000,
        help="skip the exact operator above this N (its N² wall time is "
             "the point being demonstrated); recall is then measured "
             "against the planted pairs instead",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from go_cdc_spark.functions.similarity import (
        near_dup_by_cosine,
        near_dup_by_cosine_lsh,
    )

    rows = []
    for n in [int(x) for x in args.ns.split(",")]:
        corpus = make_corpus(spark, n)
        corpus = corpus.persist()
        corpus.count()  # materialize once; both operators read the same cache
        truth = planted_pairs(n)

        t_exact = None
        exact_pairs = None
        if n <= args.exact_max:
            t0 = time.monotonic()
            exact = near_dup_by_cosine(corpus, THRESHOLD)
            exact_pairs = {(r["doc_a"], r["doc_b"]) for r in exact.collect()}
            t_exact = time.monotonic() - t0
            # sanity: the exact operator must find every planted pair
            missed = truth - exact_pairs
            assert not missed, f"exact missed {len(missed)} planted pairs at N={n}"

        t0 = time.monotonic()
        lsh = near_dup_by_cosine_lsh(corpus, THRESHOLD)
        lsh_pairs = {(r["doc_a"], r["doc_b"]) for r in lsh.collect()}
        t_lsh = time.monotonic() - t0
        ref = exact_pairs if exact_pairs is not None else truth
        recall = len(lsh_pairs & ref) / max(1, len(ref))
        if exact_pairs is not None:
            assert not (lsh_pairs - exact_pairs), "LSH emitted a false positive"
        assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 at N={n}"

        corpus.unpersist()
        timed = [("exact", t_exact)] if t_exact is not None else []
        timed.append(("lsh", t_lsh))
        for op, sec in timed:
            rec = {
                "n": n,
                "op": op,
                "seconds": round(sec, 3),
                "threshold": THRESHOLD,
                "true_pairs": len(ref),
                "recall_basis": "exact" if exact_pairs is not None else "planted",
                "recall": 1.0 if op == "exact" else round(recall, 4),
                "speedup_lsh_over_exact": (
                    round(t_exact / t_lsh, 2)
                    if op == "lsh" and t_exact is not None
                    else None
                ),
            }
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "summary": "lsh_crossover",
                "dim": DIM,
                "threshold": THRESHOLD,
                "cpus": args.cpus,
                "rows": rows,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
