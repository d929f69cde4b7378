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
