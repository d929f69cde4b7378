"""Text-analysis operators for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` Column expressions — JVM-side,
whole-stage-codegen, no Python in the hot path. Each has an exact
ANSI-SQL twin (used as the DuckDB oracle in __spark_entry__), so the
expressions deliberately stick to constructs both engines share
(regexp_replace / regexp_extract_all / md5 / split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# word-boundary marker patterns per language (shared with the SQL twin)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}
CJK_PATTERN = r"[一-鿿]"


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish proxy for budget estimation)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.!?,;:]", "")).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / token-shape quality features per doc."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tok = token_count(t)
    return df.withColumns(
        {
            "n_chars_q": n_chars,
            "n_tokens": n_tok,
            "punct_per_100_chars": F.round(
                punct_count(t) * 100.0 / F.greatest(n_chars, F.lit(1)), 4
            ),
            "mean_token_len": F.round(
                (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1)), 4
            ),
        }
    )


def _marker_score(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), 0))


def lang_id(text: Column) -> Column:
    """Heuristic language id via marker-word counts; CJK by codepoint.

    Deterministic tie-break: fixed en→de→fr→es CASE order, mirrored
    exactly in the SQL twin (__spark_entry__.oracle_sql).
    """
    s = {k: _marker_score(text, p) for k, p in LANG_MARKERS.items()}
    cjk = F.size(F.regexp_extract_all(text, F.lit(CJK_PATTERN), 0))
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


# GPT-2-style pre-tokenizer approximation: contractions, letter runs,
# single digits, punctuation runs. RE2-compatible (no lookarounds) so
# the DuckDB oracle can run the identical pattern.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count under the BPE pre-tokenizer regex —
    a closer LLM-token-budget proxy than whitespace counting."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)).cast("long")


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized content fingerprint (md5 hex) — the
    document-identity key for exact dedup."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM pretraining: documents
    are concatenated in ``id_col`` order and chunked into fixed
    ``budget``-token training sequences. Emits, per doc, the sequence it
    starts in (``seq_id``) and its token offset within that sequence
    (``seq_pos``) — exactly the layout a tokenize-and-pack dataloader
    materializes.

    Distributed global cumulative sum, two passes (the zipWithIndex
    pattern — no single-partition window, no driver data):

    1. range-repartition on ``id_col`` (order-preserving across
       partitions), map-side per-partition token sums → driver collects
       O(n_partitions) rows and prefix-sums them into start offsets;
    2. per-partition window cumsum + broadcast-joined partition offset.

    The range-partitioned intermediate is materialized (eager
    ``localCheckpoint``) before the first pass: range-partition
    boundary sampling is seeded per execution and AQE can re-coalesce
    from runtime stats, so WITHOUT the checkpoint the two passes could
    assign rows different ``_pid`` values and silently corrupt
    seq_id/seq_pos. Both passes read the one materialized partitioning.
    """
    spark = df.sparkSession
    from pyspark.sql import Window

    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    d = (
        df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
        .repartitionByRange(n_parts, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    part_sums = {
        r["_pid"]: r["s"]
        for r in d.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(part_sums):
        offsets.append((pid, acc))
        acc += int(part_sums[pid] or 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn("_start", start)
        .select(
            id_col,
            "n_tokens",
            (F.col("_start") / budget).cast("long").alias("seq_id"),
            F.pmod("_start", F.lit(budget)).cast("long").alias("seq_pos"),
        )
    )


def split_by_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split",
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    key hash: ``sha256(id:salt)`` → 60-bit integer → pure integer
    threshold compare (no floating point anywhere, so any engine that
    can sha256 reproduces the split bit-for-bit — the DuckDB oracle
    does). Changing ``salt`` resamples the split; rows never migrate
    between train and val/test under corpus growth (per-key hash, not
    position). Pure Column expressions, zero Python, zero shuffles."""
    h = _h60(F.col(id_col), salt)
    t_train = int(train * (1 << 60))
    t_val = int((train + val) * (1 << 60))
    split = (
        F.when(h < t_train, F.lit("train"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def _h60(key: Column, salt: str) -> Column:
    """sha256(key:salt) → 60-bit integer — the shared deterministic
    sampling hash (pure integer compares downstream, no floats, so any
    sha256-capable engine reproduces decisions bit-for-bit)."""
    return F.conv(
        F.substring(
            F.sha2(F.concat_ws(":", key.cast("string"), F.lit(salt)), 256), 1, 15
        ),
        16,
        10,
    ).cast("long")


def sample_stratified(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the mixture-reweighting
    stage of a pretraining pipeline (cap overrepresented languages /
    sources at a target rate). A row is kept iff
    ``sha256(id:salt) < rate(stratum) * 2^60`` — a pure integer
    threshold compare, so the decision is per-key stable (rows never
    flip under corpus growth or repartitioning, unlike
    ``df.sample``'s partition-seeded Bernoulli), reproducible across
    engines, and a zero-shuffle codegen'd scan predicate at any scale.
    Changing ``salt`` resamples; ``rates`` maps stratum value → keep
    rate, everything else keeps at ``default_rate``."""
    for name, rate in {**(rates or {}), "default_rate": default_rate}.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(
                f"keep rate for {name!r} must be in [0, 1], got {rate} "
                "(a rate like 25 meaning 25% would silently keep everything)"
            )
    thresh = None
    for value, rate in sorted((rates or {}).items()):
        cond, lit = F.col(strata_col) == value, F.lit(int(rate * (1 << 60)))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    default = F.lit(int(default_rate * (1 << 60)))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(_h60(F.col(id_col), salt) < thresh)


def _word_ngrams(text: Column, n: int) -> Column:
    """Distinct word-level n-grams of ``text`` as an array<string> —
    row-local array math (split → slide → join), zero shuffle. Words
    are lowercased and split on single spaces (the corpus convention
    shared with repetition_signals and the SQL twins). Docs with fewer
    than ``n`` words yield an empty array."""
    ws = F.filter(F.split(F.lower(text), " "), lambda w: F.length(w) > 0)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    # sequence(1, k) with k < 1 counts DOWN — guard short docs first
    return F.when(
        F.size(ws) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Test-set decontamination by word n-gram collision (the GPT-3
    appendix-C / PaLM protocol: a training doc is contaminated if it
    shares any length-``n`` word n-gram with any benchmark doc).
    Returns every training doc with its distinct-gram count, how many
    of those grams appear in the benchmark set, and the contamination
    flag — callers drop or audit the flagged rows.

    Scale shape: benchmark suites are MB-scale, so the distinct
    benchmark gram set is broadcast — the training side is ONE scan
    (row-local n-gram arrays, explode_outer so zero-gram docs keep a
    row), a broadcast left hash join that flags matches, and one
    map-side-combined per-doc count: shuffle volume is O(doc_ids),
    never O(corpus grams), and the corpus is never read twice. No
    Python anywhere."""
    grams = _word_ngrams(F.col(text_col), n)
    bench = (
        benchmark.select(F.explode(_word_ngrams(F.col(text_col), n)).alias("_bg"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    exploded = df.select(F.col(id_col), F.explode_outer(grams).alias("_bg"))
    return (
        exploded.join(F.broadcast(bench), "_bg", "left")
        .groupBy(id_col)
        .agg(
            F.count("_bg").cast("long").alias("n_grams"),
            F.count("_hit").cast("long").alias("n_matched"),
        )
        .withColumn("contaminated", F.col("n_matched") > 0)
    )


def boilerplate_score(
    df: DataFrame,
    n: int = 5,
    df_threshold: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate detection by n-gram document frequency (the
    gram-level form of CCNet's shared-paragraph dedup, Wenzek et al.
    2019): an n-gram appearing in more than ``df_threshold`` distinct
    documents is boilerplate (headers, footers, license blurbs,
    navigation chrome); each document gets its distinct-gram count and
    how many of those grams are corpus-common — filter stages drop or
    down-weight high-fraction docs.

    Scale shape: ONE corpus scan — the per-doc distinct-gram arrays are
    materialized once (localCheckpoint, breaking lineage so the
    doc-frequency aggregate and the join's left side share the same
    computed blocks instead of each re-running scan + regex + gram
    build; the materialized form is (id, gram-array), ~corpus text
    size), then one map-side-combined doc-frequency count keyed by
    gram, one co-partitioned self-join on gram (both sides
    hash-partitioned by the same key — no broadcast needed, the gram
    table is corpus-sized), one per-doc count. All shuffles carry
    (gram, id) pairs, never text. No Python."""
    grams = _word_ngrams(F.col(text_col), n)
    # eager localCheckpoint = the single corpus scan; without it the
    # agg subplan (filter+groupBy) and the raw join side differ, so
    # Spark re-executes the scan + gram explode for each (measured 2×
    # the dominant stage at sf0.1). On a real cluster swap for
    # .persist(StorageLevel.MEMORY_AND_DISK) + a downstream unpersist
    # if executor loss during the job is a concern.
    doc_grams = df.select(F.col(id_col), grams.alias("_bgs")).localCheckpoint()
    exploded = doc_grams.select(
        F.col(id_col), F.explode_outer("_bgs").alias("_bg")
    )
    common = (
        exploded.filter(F.col("_bg").isNotNull())
        .groupBy("_bg")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > df_threshold)
        .select("_bg", F.lit(1).alias("_common"))
    )
    return (
        exploded.join(common, "_bg", "left")
        .groupBy(id_col)
        .agg(
            F.count("_bg").cast("long").alias("n_grams"),
            F.count("_common").cast("long").alias("n_common_grams"),
        )
        .withColumn(
            "boilerplate_frac",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_common_grams") / F.col("n_grams"), 6),
            ).otherwise(F.lit(0.0)),
        )
    )


def vocab_top_k(df: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent lowercased whitespace
    tokens with deterministic ties (freq DESC, token ASC). The groupBy
    count is map-side-combined (partial_count before the shuffle, so
    shuffle volume is |vocab| per partition, not |tokens|), and the
    global top-k plans as TakeOrderedAndProject — per-partition heaps,
    no full sort of the vocabulary."""
    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("freq"))
    return counts.orderBy(F.col("freq").desc(), F.col("token")).limit(k)


def filter_corpus(
    df: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 1_000_000,
    max_punct_per_100: float = 25.0,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    text_col: str = "text",
) -> DataFrame:
    """Training-corpus quality gate: length window + punctuation-density
    cap + language allowlist, composed from the oracle-checked quality
    and lang-id columns. Pure Column expressions — the filter is one
    codegen'd predicate over the scan, no shuffle, no Python."""
    q = quality_features(df, text_col)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("punct_per_100_chars") <= max_punct_per_100)
        & lang_id(F.col(text_col)).isin(*langs)
    )
    return q.filter(keep)


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 repetition filters, adapted to word level —
    the corpus has no line structure):

    - ``distinct_word_ratio``: |distinct words| / |words| — row-local
      array math, zero shuffle.
    - ``top_bigram_frac``: occurrences of the document's most frequent
      word bigram / total bigrams — explode + two map-side-combined
      aggregates keyed by doc, so shuffle volume is O(distinct bigrams
      per doc), never O(corpus bigrams) in a single reducer; per-doc
      work is embarrassingly parallel at 100 TB.

    Docs with fewer than two words have no bigram and are dropped
    (both the Spark plan and the SQL twin agree on this edge). The
    counts are exact longs (the oracle gate hashes them bit-for-bit);
    the ratio columns are derived from them at the end."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda w: F.length(w) > 0
    )
    base = df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
        words.alias("_w"),
    )
    # bigram i (0-based over the first n-1 words) = words[i+1]·words[i+2]
    # in element_at's 1-based indexing
    bigrams = F.transform(
        F.slice(F.col("_w"), 1, F.greatest(F.size(F.col("_w")) - 1, F.lit(0))),
        lambda w, i: F.concat(
            w, F.lit(" "), F.element_at(F.col("_w"), i + F.lit(2))
        ),
    )
    exploded = base.select(
        id_col, "n_words", "n_distinct_words", F.explode(bigrams).alias("_bg")
    )
    per_bigram = exploded.groupBy(
        id_col, "n_words", "n_distinct_words", "_bg"
    ).agg(F.count("*").alias("_n"))
    agg = per_bigram.groupBy(id_col, "n_words", "n_distinct_words").agg(
        F.max("_n").cast("long").alias("top_bigram_n"),
        F.sum("_n").cast("long").alias("n_bigrams"),
    )
    return agg.select(
        id_col,
        "n_words",
        "n_distinct_words",
        "top_bigram_n",
        "n_bigrams",
        F.round(F.col("n_distinct_words") / F.col("n_words"), 6).alias(
            "distinct_word_ratio"
        ),
        F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 6).alias(
            "top_bigram_frac"
        ),
    )
