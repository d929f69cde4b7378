"""Training-data operator tests: text analysis, dedup, similarity,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_spark.functions.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from go_cdc_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    resize_images,
    synthetic_media,
)
from go_cdc_spark.functions.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    kmeans_centroids,
    lsh_ann_topk,
    near_dup_by_cosine,
)
from go_cdc_spark.functions.text import fingerprint, lang_id, quality_features, token_count

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! This is fine."), (2, "   "), (3, "one")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r.asDict() for r in quality_features(df).collect()}
    assert out[1]["n_tokens"] == 5 and out[2]["n_tokens"] == 0 and out[3]["n_tokens"] == 1
    assert out[1]["punct_per_100_chars"] > 0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze ist hier"),
            (3, "le chat et la maison est grande"),
            (4, "el perro y los gatos es aqui"),
            (5, "这是一个中文句子"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["g"] for r in df.select("doc_id", lang_id(F.col("text")).alias("g")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh"}


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a  b c"), (2, "A b C"), (3, "unique doc"), (4, "a b c")],
        ["doc_id", "text"],
    )
    groups = exact_duplicates(df).collect()
    sizes = sorted(g["group_size"] for g in groups)
    assert sizes == [1, 3]  # whitespace/case-normalized dupes collapse
    kept = dedup_exact(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]


def test_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "spark makes big data simple and fast"),
            (2, "spark makes big data simple and cheap"),
            (3, "completely different words here"),
        ],
        ["doc_id", "text"],
    )
    pairs = jaccard_pairs(df, threshold=0.5).collect()
    assert len(pairs) == 1
    assert (pairs[0]["doc_a"], pairs[0]["doc_b"]) == (1, 2)
    assert abs(pairs[0]["jaccard"] - 6 / 8) < 1e-6


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base.replace("today", "tomorrow")), (3, "zebra " * 12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, n_hashes=64, bands=16, threshold=0.4).collect()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert (1, 2) in found and (1, 3) not in found
    # determinism: second run identical
    pairs2 = minhash_lsh_pairs(df, n_hashes=64, bands=16, threshold=0.4).collect()
    assert sorted(map(str, pairs)) == sorted(map(str, pairs2))


def test_simhash_near_pairs(spark):
    words = [f"word{i}" for i in range(60)]
    rows = [
        (1, " ".join(words)),
        (2, " ".join(words[:-1] + ["zzz"])),  # one-token edit: hamming ≈ 2
        (3, " ".join(f"other{i}" for i in range(60))),  # hamming ≈ 33
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = simhash_near_pairs(df, max_hamming=8).collect()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert (1, 2) in found and (1, 3) not in found


def test_brute_force_topk_against_numpy(spark):
    emb = spark.read.parquet(EMB)
    queries = emb.filter(F.col("vec_id") < 3)
    got = brute_force_topk(emb, queries, k=5).toPandas()
    # numpy oracle
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    for qi in range(3):
        sims = Mn @ Mn[ids == qi].T
        sims = sims.ravel()
        order = np.lexsort((ids, -sims))
        expect = [int(ids[j]) for j in order if ids[j] != qi][:5]
        mine = got[got.query_id == qi].sort_values("rank")["neighbor_id"].tolist()
        assert mine == expect, f"query {qi}: {mine} vs {expect}"


def test_lsh_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(EMB).cache()
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    # the synthetic embeddings are near-random (top-5 cos ≈ 0.36) —
    # the hardest case for LSH — so short signatures + many tables is
    # the right operating point; measured recall at (3, 16) is 0.97
    # and deterministic (fixed data + seed), leaving real margin
    approx = lsh_ann_topk(emb, queries, k=5, n_bits=3, n_tables=16).toPandas()
    hits = 0
    for qi in exact.query_id.unique():
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        hits += len(e & a) / max(len(e), 1)
    recall = hits / exact.query_id.nunique()
    assert recall >= 0.9, f"recall {recall}"
    emb.unpersist()


def test_bpe_token_count(spark):
    from go_cdc_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [(1, "don't stop"), (2, "x=42;"), (3, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    # don | 't | stop ; x | = | 4 | 2 | ;
    assert out[1] == 3 and out[2] == 5 and out[3] == 0


def test_winnow_shared_substring_guarantee(spark):
    from go_cdc_spark.functions.dedup import winnow_fingerprints, winnow_near_pairs

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, "AAA " + shared + " BBB"),
        (2, "CCC " + shared + " DDD"),
        (3, "completely unrelated content about spark shuffles and parquet"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # any substring of length >= k+window-1 chars must yield a shared fp
    pairs = winnow_near_pairs(df, min_shared=3, k=8, window=4).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {(1, 2)}
    # deterministic across runs
    a = sorted(r.fp for r in winnow_fingerprints(df, 8, 4).collect())
    b = sorted(r.fp for r in winnow_fingerprints(df, 8, 4).collect())
    assert a == b


def test_jaccard_dense_and_prefix_paths_agree(spark):
    docs = spark.read.parquet(DOCS).limit(300)
    dense = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    # dense_vocab_max=0 forces the AllPairs prefix-filter path
    prefix = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.7, dense_vocab_max=0).collect()
    }
    assert dense == prefix and len(dense) > 0


def test_kmeans_centroids_deterministic_and_normalized(spark):
    emb = spark.read.parquet(EMB)
    c1 = kmeans_centroids(emb, n_centroids=8, n_iters=3)
    c2 = kmeans_centroids(emb, n_centroids=8, n_iters=3)
    assert np.allclose(c1, c2)  # seeded init + Lloyd is deterministic
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(EMB).cache()
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    # near-random synthetic vectors are IVF's worst case (cells barely
    # separate); probing 12/16 cells still prunes 25% of scoring and
    # measures a deterministic 0.92 recall@5 on this fixed corpus —
    # real embedding clusters would hit the same recall at far lower
    # probe fractions
    approx = ivf_ann_topk(emb, queries, k=5, n_centroids=16, n_probe=12).toPandas()
    hits = 0
    for qi in exact.query_id.unique():
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(approx[approx.query_id == qi].neighbor_id)
        hits += len(e & a) / max(len(e), 1)
    recall = hits / exact.query_id.nunique()
    assert recall >= 0.9, f"recall {recall}"
    emb.unpersist()


def test_near_dup_cosine_symmetric_threshold(spark):
    emb = spark.read.parquet(EMB)
    pairs = near_dup_by_cosine(emb.limit(200), threshold=0.9)
    for p in pairs.collect():
        assert p["doc_a"] < p["doc_b"] and p["cos_sim"] >= 0.9


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 50)
    assert media.schema["meta"].dataType.fieldNames() == [
        "width", "height", "sample_rate", "n_frames", "mime"]
    feats = extract_features(media, codec="fake").collect()
    assert len(feats) == 50
    assert all(len(r["features"]) == 16 for r in feats)
    # bit-exact parity with the reference chain the JVM columns replaced:
    # sha256(payload.hex()) digest, features = little-endian uint16s/65535
    import hashlib
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in feats[:10]:
        digest = hashlib.sha256(payloads[r["media_id"]].hex().encode()).digest()
        assert r["payload_sha"] == digest.hex()
        ref = np.frombuffer(digest, dtype="<u2").astype(np.float32) / np.float32(65535)
        assert np.array_equal(np.asarray(r["features"], dtype=np.float32), ref)
    # determinism
    feats2 = extract_features(synthetic_media(spark, 50), codec="fake").collect()
    assert {r["media_id"]: r["payload_sha"] for r in feats} == {
        r["media_id"]: r["payload_sha"] for r in feats2
    }
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        extract_features(media, codec="real").collect()
    plan = frame_sample_plan(media, every_n=30)
    assert plan.filter("frame_idx % 30 != 0").count() == 0
    resized = resize_images(media, 64, 64, codec="fake").collect()
    assert len(resized) == media.filter("kind = 'image'").count() > 0
    assert all(r["meta"]["width"] == 64 and r["meta"]["height"] == 64 for r in resized)
    assert all(len(bytes(r["payload"])) == 64 * 64 // 256 for r in resized)


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Quality gate for the approximate dedup_minhash_lsh query.

    MinHash estimates SHINGLE-set Jaccard, so the exact counterpart is
    token-set Jaccard over shingle-tokens (each 3-gram re-joined into
    one whitespace token) — NOT raw token Jaccard, which measures a
    different similarity entirely on small-vocabulary corpora. Planted
    one-token edits of 40-token docs have exact shingle-Jaccard ≈ 0.85;
    banded MinHash at threshold 0.6 (≈5σ below with 128 hashes) must
    recover ≥90% of the exact pairs and estimate their Jaccard within
    0.15 (fixed seeds — deterministic)."""
    rows, shingle_rows = [], []
    for i in range(30):
        words = [f"w{i}_{j}" for j in range(40)]
        edited = words[:20] + ["EDIT"] + words[21:]
        for doc_id, toks in ((2 * i, words), (2 * i + 1, edited)):
            rows.append((doc_id, " ".join(toks)))
            shingle_rows.append(
                (
                    doc_id,
                    " ".join(
                        "_".join(toks[j : j + 3]) for j in range(len(toks) - 2)
                    ).lower(),
                )
            )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    shingled = spark.createDataFrame(shingle_rows, ["doc_id", "text"])
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(shingled, threshold=0.7).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    approx = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(
            df, n_hashes=128, bands=32, threshold=0.6
        ).collect()
    }
    found = set(exact) & set(approx)
    recall = len(found) / len(exact)
    assert recall >= 0.9, f"recall {recall} over {len(exact)} exact pairs"
    assert all(abs(approx[p] - exact[p]) <= 0.15 for p in found)


def test_simhash_recall_on_planted_near_dups(spark):
    """Quality gate for dedup_simhash: one-token edits of 40-token docs
    must land within the hamming budget; unrelated docs must not."""
    rows = []
    for i in range(30):
        words = [f"tok{i}_{j}" for j in range(40)]
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(words[:-1] + ["edited"])))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    found = {
        (p.doc_a, p.doc_b) for p in simhash_near_pairs(df, max_hamming=12).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"recall {recall}"
    # distinct-vocabulary docs must stay far apart: every reported pair
    # should be a planted one (tolerate nothing else at this budget)
    assert found <= planted, f"false positives: {found - planted}"


def test_winnow_fingerprints_match_python_oracle(spark):
    """Exact oracle for dedup_winnow: an independent pure-Python
    re-implementation of MOSS winnowing (Horner rolling hash mod 2^64,
    rightmost-min windows) must produce the identical fingerprint set."""
    from go_cdc_spark.functions.dedup import winnow_fingerprints

    k, window = 8, 4
    docs = spark.read.parquet(DOCS).limit(40)
    got = {
        (r.doc_id, r.fp) for r in winnow_fingerprints(docs, k, window).collect()
    }

    def winnow_py(text: str) -> set[int]:
        b = text.encode("utf-8")
        if len(b) < k:
            return set()
        hashes = []
        for i in range(len(b) - k + 1):
            h = 0
            for ch in b[i : i + k]:
                h = (h * 257 + ch) % (1 << 64)
            hashes.append(h)
        if len(hashes) < window:
            chosen = set(hashes)
        else:
            chosen = set()
            for i in range(len(hashes) - window + 1):
                win = hashes[i : i + window]
                m = min(win)
                chosen.add(win[(window - 1) - win[::-1].index(m)])
        return {h - (1 << 64) if h >= 1 << 63 else h for h in chosen}

    expect = set()
    for row in docs.select("doc_id", "text").collect():
        expect.update((row.doc_id, fp) for fp in winnow_py(str(row.text)))
    assert got == expect


def test_simhash_matches_bit_vote_oracle(spark):
    """The JVM-side simhash assembly must equal a python majority-vote
    over the same per-token xxhash64 values."""
    from go_cdc_spark.functions.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta"), (3, "")],
        ["doc_id", "text"],
    )
    tok = (
        df.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .filter(F.length("t") > 0)
        .select("doc_id", F.xxhash64("t").alias("h"))
        .collect()
    )
    by_doc: dict[int, list[int]] = {}
    for r in tok:
        by_doc.setdefault(r.doc_id, []).append(r.h & ((1 << 64) - 1))
    expect = {}
    for d in [1, 2, 3]:
        hs = by_doc.get(d, [])
        sig = 0
        for i in range(64):
            if sum((h >> i) & 1 for h in hs) * 2 > len(hs):
                sig |= 1 << i
        expect[d] = sig - (1 << 64) if sig >= 1 << 63 else sig
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert got == expect


def test_jaccard_blocked_path_parity_no_driver_matrix(spark, monkeypatch):
    """Above the doc-count gate, dense Jaccard must run the sharded
    block-pair path: identical results AND no driver toPandas of the
    corpus (vocab collect — O(|vocab|) — is the only driver state)."""
    from pyspark.sql import DataFrame

    docs = spark.read.parquet(DOCS).limit(300)
    expect = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.7).collect()
    }
    assert expect

    def boom(self, *a, **k):
        raise AssertionError("blocked path must not toPandas the corpus")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(
            docs, threshold=0.7, dense_driver_max_docs=0, dense_shards=4
        ).collect()
    }
    assert got == expect


def test_cosine_blocked_path_parity_no_driver_collect(spark, monkeypatch):
    """Above max_broadcast_rows, near_dup_by_cosine must run the fully
    distributed block-pair path: identical pairs, no driver toPandas."""
    from pyspark.sql import DataFrame

    emb = spark.read.parquet(EMB)
    expect = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in near_dup_by_cosine(emb, threshold=0.45).collect()
    }
    assert expect

    def boom(self, *a, **k):
        raise AssertionError("blocked path must not toPandas the corpus")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    got = {
        (r.doc_a, r.doc_b): r.cos_sim
        for r in near_dup_by_cosine(
            emb, threshold=0.45, max_broadcast_rows=0, n_shards=4
        ).collect()
    }
    assert got == expect


def _union_find_components(edges):
    """Pure-Python oracle: component = min node id per cluster."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def test_connected_components_vs_union_find(spark):
    """Adversarial graph shapes vs a pure-Python union-find oracle:
    a LONG CHAIN (the worst case for plain min-label propagation, whose
    round count is the graph diameter — star contraction must converge
    within the O(log n) round cap), cliques, a star, a 2-node component
    (the center-edge regression case), and seeded random edges."""
    import random

    from go_cdc_spark.functions.dedup import connected_components

    rng = random.Random(7)
    edges = []
    edges += [(i, i + 1) for i in range(100, 300)]  # 201-node chain
    edges += [(a, b) for a in range(500, 510) for b in range(a + 1, 510)]  # clique
    edges += [(900, x) for x in range(901, 920)]  # star
    edges += [(2000, 2001)]  # minimal 2-node component
    nodes = list(range(3000, 3100))
    edges += [tuple(rng.sample(nodes, 2)) for _ in range(80)]  # random
    rng.shuffle(edges)
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_rounds=12).collect()
    }
    want = _union_find_components(edges)
    assert got == want
    # every component label is the min id of its cluster (canonical)
    assert all(c <= n for n, c in got.items())


def test_connected_components_fails_loudly(spark):
    """Non-castable ids and round exhaustion must RAISE, not silently
    return a wrong mapping (dedup would keep/drop the wrong docs)."""
    import pytest

    from go_cdc_spark.functions.dedup import connected_components

    bad = spark.createDataFrame(
        [("x1", "y2"), ("3", "4")], "doc_a string, doc_b string"
    )
    with pytest.raises(ValueError, match="cast to long"):
        connected_components(bad).collect()

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_rounds=1).collect()


def test_lsh_near_dup_giant_duplicate_cluster(spark):
    """A big exact-duplicate cluster hashes to the SAME bucket in every
    table no matter the bit width — pair generation must degrade to
    |cluster|² output ROWS (slice-explode), never one |cluster|²-struct
    array row (the pre-round-4 formulation, which OOMs an executor on
    the first real corpus with a boilerplate cluster). 120 clones →
    7,140 pairs, all found, plus nothing from the decoys."""
    import numpy as np

    from go_cdc_spark.functions.similarity import near_dup_by_cosine_lsh

    rng = np.random.default_rng(7)
    clone = rng.standard_normal(64).tolist()
    rows = [(i, clone) for i in range(120)]
    rows += [(1000 + i, rng.standard_normal(64).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = near_dup_by_cosine_lsh(df, threshold=0.99).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert pairs == {(a, b) for a in range(120) for b in range(120) if a < b}
    assert all(r["cos_sim"] == 1.0 for r in got)


def test_lsh_near_dup_degenerate_inputs(spark):
    """Empty corpus → empty result (broadcast verify must not vstack
    nothing); zero vectors in the DISTRIBUTED verify regime must not
    emit NaN pairs (Spark orders NaN above every double, so an
    unfloored 0/0 would pass `>= threshold`)."""
    from go_cdc_spark.functions.similarity import near_dup_by_cosine_lsh

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert near_dup_by_cosine_lsh(empty, threshold=0.9).count() == 0

    import math

    rows = [(0, [0.0] * 64), (1, [0.0] * 64)]
    rows += [(2 + i, [float(j == i) for j in range(64)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # max_broadcast_rows=2 forces the distributed (join-based) verify
    got = near_dup_by_cosine_lsh(
        df, threshold=0.5, n_bits=2, n_tables=8, max_broadcast_rows=2
    ).collect()
    assert all(not math.isnan(r["cos_sim"]) for r in got)
    assert not {(r["doc_a"], r["doc_b"]) for r in got} & {(0, 1)}


def test_lsh_near_dup_recall_vs_exact(spark):
    """The LSH-bucketed near-dup path must recover ≥0.9 of the exact
    operator's pairs at the ENTRY operating point (auto-scaled bits &
    tables — the round-3 fixed-bits defect), with NO false positives
    (candidates are verified with exact cosine), AND the candidate set
    must stay well short of all-pairs — an LSH whose candidates
    saturate the pair space is exhaustive search with extra steps."""
    from go_cdc_spark.functions.similarity import (
        lsh_auto_bits,
        lsh_auto_tables,
        lsh_frac_floor_bits,
        near_dup_by_cosine,
        near_dup_by_cosine_lsh,
        _bucket_array_signatures,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in near_dup_by_cosine(emb, threshold=0.45).collect()
    }
    approx_rows = near_dup_by_cosine_lsh(
        emb, threshold=0.45, target_bucket_rows=1, target_recall=0.92
    ).collect()
    approx = {(r["doc_a"], r["doc_b"]) for r in approx_rows}
    assert exact, "fixture should contain near-dup pairs"
    assert approx <= exact  # verified candidates: zero false positives
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9"

    # candidate-volume gate: distinct colliding pairs < 25% of N(N-1)/2,
    # measured at the SAME bit width the operator above resolved
    # (max of occupancy bits and the frac floor — measuring
    # occupancy-only signatures would gate a point production never runs)
    n = emb.count()
    bits = max(lsh_auto_bits(n, 1), lsh_frac_floor_bits(0.45, 0.92))
    tables = lsh_auto_tables(0.45, bits, 0.92)
    sig = _bucket_array_signatures(emb, bits, 64, "vec_id", "embedding", 42, tables)
    sig = sig.select("vec_id", F.posexplode("buckets").alias("table", "bucket"))
    n_cand = (
        sig.select(F.col("vec_id").alias("doc_a"), "table", "bucket")
        .join(sig.select(F.col("vec_id").alias("doc_b"), "table", "bucket"),
              ["table", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    frac = n_cand / (n * (n - 1) / 2)
    assert frac < 0.25, f"candidate fraction {frac:.3f} — LSH degenerated"


def test_pack_sequences_partition_invariant(spark):
    """The two-pass distributed cumsum must equal the sequential
    definition regardless of partition count — same seq_id/seq_pos at
    n_partitions=1 (single window) and n_partitions=7."""
    from go_cdc_spark.functions.text import pack_sequences

    rows = [(i, "tok " * ((i * 7) % 23 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r["doc_id"]: (r["seq_id"], r["seq_pos"], r["n_tokens"])
         for r in pack_sequences(df, budget=64, n_partitions=1).collect()}
    b = {r["doc_id"]: (r["seq_id"], r["seq_pos"], r["n_tokens"])
         for r in pack_sequences(df, budget=64, n_partitions=7).collect()}
    assert a == b and len(a) == 200
    # sequential semantics: starts are the exclusive prefix sum in id order
    start = 0
    for i in range(200):
        sid, pos, n = a[i]
        assert (sid, pos) == (start // 64, start % 64)
        start += n


def test_split_by_hash_deterministic_and_stable(spark):
    """Split is deterministic, covers every row, roughly honors the
    weights, and per-key assignment is invariant under corpus growth
    (hash-keyed, not position-keyed)."""
    from go_cdc_spark.functions.text import split_by_hash

    docs = spark.read.parquet(DOCS)
    out1 = {r["doc_id"]: r["split"] for r in split_by_hash(docs).collect()}
    out2 = {r["doc_id"]: r["split"] for r in split_by_hash(docs).collect()}
    assert out1 == out2 and set(out1.values()) <= {"train", "val", "test"}
    n = len(out1)
    frac_train = sum(1 for v in out1.values() if v == "train") / n
    assert 0.8 <= frac_train <= 0.97
    # growth stability: assignments on a subset are unchanged
    sub = {r["doc_id"]: r["split"]
           for r in split_by_hash(docs.filter("doc_id < 50")).collect()}
    assert all(out1[k] == v for k, v in sub.items())
    # different salt resamples
    alt = {r["doc_id"]: r["split"]
           for r in split_by_hash(docs, salt="other").collect()}
    assert alt != out1


def test_semantic_dedup_drops_planted_copies(spark):
    """Production-mode SemDeDup (Lloyd-trained clusters): planted
    near-copies of corpus vectors must be dropped (their original has a
    lower id and cosine ~1), originals kept; verdicts verified against
    a brute-force in-cluster check."""
    from go_cdc_spark.functions.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(120, 16).astype(np.float64)
    rows = [(i, base[i].tolist()) for i in range(120)]
    # ids 1000+ are jittered copies of vectors 0..19
    for i in range(20):
        rows.append((1000 + i, (base[i] + rng.randn(16) * 1e-3).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, threshold=0.98, n_centroids=8, n_iters=3, seed=1)
    got = {r["vec_id"]: (r["cid"], r["keep"]) for r in out.collect()}
    assert len(got) == 140
    for i in range(20):  # copy lands in the original's cluster and drops
        assert got[1000 + i][0] == got[i][0]
        assert got[1000 + i][1] is False and got[i][1] is True
    # brute-force verify every verdict within each cluster
    import collections
    vecs = {vid: np.asarray(v) / np.linalg.norm(v) for vid, v in rows}
    by_cid = collections.defaultdict(list)
    for vid, (cid, _) in got.items():
        by_cid[cid].append(vid)
    for cid, vids in by_cid.items():
        for vid in vids:
            has_lower = any(
                o < vid and float(vecs[o] @ vecs[vid]) >= 0.98 for o in vids
            )
            assert got[vid][1] == (not has_lower), (cid, vid)


def test_vocab_top_k_counts_and_ties(spark):
    from go_cdc_spark.functions.text import vocab_top_k

    df = spark.createDataFrame(
        [(1, "a b b C c c"), (2, "c A a"), (3, "   ")], ["doc_id", "text"]
    )
    out = [(r["token"], r["freq"]) for r in vocab_top_k(df, k=2).collect()]
    # lowercased: c=4, a=3, b=2; deterministic order freq DESC, token ASC
    assert out == [("c", 4), ("a", 3)]
    # tie order: freq-3 'a' vs freq-3 'ab' -> token ASC
    df2 = spark.createDataFrame([(1, "x x x y y y")], ["doc_id", "text"])
    out2 = [(r["token"], r["freq"]) for r in vocab_top_k(df2, k=2).collect()]
    assert out2 == [("x", 3), ("y", 3)]


def test_filter_corpus_gates(spark):
    from go_cdc_spark.functions.text import filter_corpus

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is to be found"),  # en, 12 tok
            (2, "short text"),  # too short
            (3, "der hund und die katze und der vogel und das haus ist"),  # de
            (4, "a! b! c! d! e! f! g! h! i! j! k! l!"),  # punct-dense
        ],
        ["doc_id", "text"],
    )
    kept = {r["doc_id"] for r in filter_corpus(
        df, min_tokens=5, max_tokens=50, max_punct_per_100=10, langs=("en",)
    ).collect()}
    assert kept == {1}
    kept_all = {r["doc_id"] for r in filter_corpus(
        df, min_tokens=5, max_tokens=50, max_punct_per_100=50, langs=("en", "de")
    ).collect()}
    assert kept_all == {1, 3, 4}


def test_lsh_frac_floor_bits_bounds_tables_and_fraction():
    """Round-4 policy: resolved bits = max(occupancy, frac floor).
    The floor is scale-free and must (a) keep the predicted random-pair
    candidate fraction ≤ 25% and (b) never let a small corpus at a wide
    threshold over-pay signatures (the 11-bit/295-table round-3 point)."""
    from go_cdc_spark.functions.similarity import (
        lsh_auto_bits,
        lsh_auto_tables,
        lsh_frac_floor_bits,
    )

    for threshold in (0.45, 0.6, 0.8, 0.95):
        b = lsh_frac_floor_bits(threshold, 0.92)
        t = lsh_auto_tables(threshold, b, 0.92)
        frac = 1 - (1 - 0.5**b) ** t
        assert frac <= 0.25
        # one fewer bit must violate the cap (minimality) unless b == 1
        if b > 1:
            t1 = lsh_auto_tables(threshold, b - 1, 0.92)
            assert 1 - (1 - 0.5 ** (b - 1)) ** t1 > 0.25
    # the wide-threshold small-corpus case that motivated the floor:
    bits = max(lsh_auto_bits(2000, 4), lsh_frac_floor_bits(0.45, 0.92))
    assert bits == 9
    assert lsh_auto_tables(0.45, bits, 0.92) < 150  # was 295 at 11 bits
    # occupancy still wins at large N (volume stays linear)
    assert max(lsh_auto_bits(10**6, 4), lsh_frac_floor_bits(0.45, 0.92)) == 18


def test_repetition_signals_counts(spark):
    """Hand-checked repetition counts: planted bigram loop vs an
    all-distinct doc; one-word and empty docs drop (no bigram)."""
    from go_cdc_spark.functions.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "go stop go stop go"),  # bigrams: g·s ×2, s·g ×2
            (2, "a b c d"),  # all distinct, every bigram unique
            (3, "solo"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(rows) == {1, 2}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_distinct_words"]) == (5, 2)
    assert (r1["top_bigram_n"], r1["n_bigrams"]) == (2, 4)
    assert r1["top_bigram_frac"] == 0.5
    r2 = rows[2]
    assert (r2["n_words"], r2["n_distinct_words"]) == (4, 4)
    assert (r2["top_bigram_n"], r2["n_bigrams"]) == (1, 3)
    assert r2["distinct_word_ratio"] == 1.0


def test_sample_stratified_deterministic_per_stratum(spark):
    """Per-stratum keep rates honored (±tolerance), decisions per-key
    stable under corpus growth and repartitioning, default stratum
    keeps everything, salt resamples."""
    from go_cdc_spark.functions.text import sample_stratified

    rows = [(i, ["en", "zh", "de"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.3, "zh": 0.6}
    kept = {r["doc_id"]: r["lang"]
            for r in sample_stratified(df, rates=rates).collect()}
    by_lang = {
        lang: sum(1 for v in kept.values() if v == lang) / 1000
        for lang in ("en", "zh", "de")
    }
    assert abs(by_lang["en"] - 0.3) < 0.06
    assert abs(by_lang["zh"] - 0.6) < 0.06
    assert by_lang["de"] == 1.0  # default_rate keeps the whole stratum
    # growth/partitioning stability: subset decisions identical
    sub = {r["doc_id"] for r in
           sample_stratified(df.filter("doc_id < 500").repartition(13),
                             rates=rates).collect()}
    assert sub == {k for k in kept if k < 500}
    # salt resamples
    alt = {r["doc_id"] for r in
           sample_stratified(df, rates=rates, salt="other").collect()}
    assert alt != set(kept)


def test_decontaminate_flags_ngram_collisions(spark):
    """A training doc sharing an 8-word window with the benchmark is
    flagged; gram counts are exact; short docs (<8 words) have zero
    grams and pass clean."""
    from go_cdc_spark.functions.text import decontaminate

    leak = "the quick brown fox jumps over the lazy dog tonight"
    bench = spark.createDataFrame([(100, leak)], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            # contains words 2..9 of the benchmark doc as a window
            (1, "prefix quick brown fox jumps over the lazy dog suffix"),
            (2, "a completely different document about spark engines ok yes"),
            (3, "too short to gram"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_matched"] == 1
    # 10 words -> 3 distinct 8-grams
    assert out[1]["n_grams"] == 3
    assert not out[2]["contaminated"] and out[2]["n_matched"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_incremental_dedup_anti_join_and_in_batch(spark):
    """New docs already fingerprinted in the index are rejected;
    in-batch duplicates collapse to the min id; genuinely new content
    is admitted."""
    from go_cdc_spark.functions.dedup import incremental_dedup
    from go_cdc_spark.functions.text import fingerprint as fp

    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], ["doc_id", "text"]
    ).select(fp(F.col("text")).alias("fp"))
    batch = spark.createDataFrame(
        [
            (10, "seen  BEFORE "),  # whitespace/case-normalized dup of index
            (11, "brand new doc"),
            (12, "brand new doc"),  # in-batch dup, higher id loses
            (13, "another new one"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"] for r in incremental_dedup(batch, corpus).collect()}
    assert got == {11, 13}


def test_boilerplate_score_flags_shared_grams(spark):
    """A phrase planted in 5 docs crosses df_threshold=3 and its grams
    count as common; unique text does not; short docs get zero grams
    with frac 0.0."""
    from go_cdc_spark.functions.text import boilerplate_score

    footer = "subscribe to our newsletter for updates today"  # 7 words
    rows = [(i, f"unique body {i} alpha beta gamma " + footer) for i in range(5)]
    rows += [(10, "a completely original document with no shared phrases at all")]
    rows += [(11, "tiny doc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in boilerplate_score(df, n=5, df_threshold=3).collect()}
    assert len(out) == 7
    # the footer contributes 3 distinct 5-grams present in all 5 docs;
    # the bridge gram "beta gamma subscribe to our" etc. also repeat
    for i in range(5):
        assert out[i]["n_common_grams"] >= 3
        assert 0 < out[i]["boilerplate_frac"] <= 1.0
    assert out[10]["n_common_grams"] == 0 and out[10]["boilerplate_frac"] == 0.0
    assert out[11]["n_grams"] == 0 and out[11]["boilerplate_frac"] == 0.0


def test_word_ngrams_matches_python_oracle(spark):
    """The row-local n-gram expression (split → slide → join, with the
    short-doc guard) must agree with a plain-Python reference on
    adversarial strings: repeated/leading/trailing spaces, exactly-n
    words, n-1 words, unicode, empties."""
    import random

    from go_cdc_spark.functions.text import _word_ngrams

    rng = random.Random(42)
    vocab = ["the", "a", "Foo", "BAR", "naïve", "零一二", "x"]
    rows = [(0, ""), (1, " "), (2, "one two three"), (3, "a b c d"),
            (4, "  a  b   c d  ")]
    for i in range(5, 60):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
        sep = lambda: " " * rng.randrange(1, 3)  # noqa: E731
        rows.append((i, sep().join(words) if words else ""))

    def py_ngrams(text, n):
        ws = [w for w in text.lower().split(" ") if w]
        if len(ws) < n:
            return []
        seen, out = set(), []
        for j in range(len(ws) - n + 1):
            g = " ".join(ws[j : j + n])
            if g not in seen:
                seen.add(g)
                out.append(g)
        return out

    df = spark.createDataFrame(rows, ["i", "t"])
    for n in (2, 4):
        got = {r["i"]: r["g"] for r in df.select(
            "i", _word_ngrams(F.col("t"), n).alias("g")).collect()}
        for i, t in rows:
            assert got[i] == py_ngrams(t, n), (n, i, t, got[i])


def test_sample_stratified_rejects_out_of_range_rates(spark):
    from go_cdc_spark.functions.text import sample_stratified

    df = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        sample_stratified(df, rates={"en": 25})
    with pytest.raises(ValueError, match="default_rate"):
        sample_stratified(df, default_rate=-0.1)
