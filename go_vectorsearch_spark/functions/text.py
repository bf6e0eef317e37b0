"""Text-analysis column functions for the documents pipeline.

The reference's only text machinery is Flatten/Split (server/format.go:17-108,
see operators/documents.py); a 100 TB training-data pipeline additionally
needs per-document analysis primitives. All functions here are pure Spark
column expressions (JVM-side, whole-stage-codegen'd — no Python UDFs), and
each has a DuckDB-portable SQL twin in queries.py, which forces the
arithmetic to stay engine-neutral:

  * token ids / hashes come from md5 hex prefixes (identical in any engine),
    never from engine-specific hash functions;
  * integer division is explicit ``floor`` (DuckDB CAST(double AS BIGINT)
    rounds, Spark truncates — never cast a fractional double to int);
  * all ratios are computed in float64 and rounded to 6 decimals at the edge.

Scale notes (100 TB design point): everything is a narrow per-row
projection — no shuffle, no UDF, fully pipelined inside the parquet scan
stage. Token arrays are intermediate expressions only and are never
materialized to storage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer shared by every op (lowercased for analysis ops).
_WS = r"\s+"

# A GPT-2-style pre-tokenizer regex, simplified to the engine-portable
# subset (letter runs / digit runs / single punctuation marks).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Small function-word list used for quality scoring and language ID.
STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with"]

# Marker function words per language (stopword-profile language ID — the
# classic cheap heuristic; tie-break = alphabetical language code).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "and", "is", "of", "to", "it", "that"],
    "es": ["el", "la", "los", "las", "es", "y", "que"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you"],
}

# Rabin–Karp polynomial fingerprint constants (token-level rolling hash).
FP_BASE = 31
FP_MOD = 1_000_000_007


def ws_tokens(text: Column, lower: bool = True) -> Column:
    """Whitespace tokens of ``text`` (optionally lowercased)."""
    t = F.trim(text)
    if lower:
        t = F.lower(t)
    return F.split(t, _WS)


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (letter runs, digit runs, punct marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def md5_int32(col: Column) -> Column:
    """First 8 hex digits of md5 as a non-negative bigint in [0, 2^32).

    The engine-portable stand-in for a hash function: identical in Spark,
    DuckDB, and any engine with md5 — unlike xxhash64/murmur whose seeds
    and variants differ per engine.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def stopword_ratio(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are function words (float64)."""
    sw = F.lit(list(stopwords or STOPWORDS))
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.size(tokens).cast("double")


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters (float64).

    Empty/NULL text scores 0.0, not NULL: 0/0 → NULL in Spark, and a
    NULL quality_score passes NEITHER side of a junk filter — the
    emptiest documents (exactly what a quality sweep exists to catch)
    would silently dodge both the remove-set and the keep-set."""
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(
        F.length(text) > 0,
        n_alpha.cast("double") / F.length(text).cast("double"),
    ).otherwise(F.lit(0.0))


def mean_token_len(tokens: Column) -> Column:
    """Mean token length in characters (float64)."""
    total = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return total.cast("double") / F.size(tokens).cast("double")


def quality_score_from_parts(ar: Column, sr: Column, ml: Column) -> Column:
    """The quality formula over precomputed (alpha_ratio, stop_ratio,
    mean_token_len) columns — THE single source of the weights. Callers
    that stage the three ratios (to avoid re-tokenizing per component)
    build the score from their staged columns via this.
    """
    return (
        F.lit(0.4) * ar
        + F.lit(0.3) * (F.lit(1.0) - F.abs(sr - F.lit(0.4)))
        + F.lit(0.3) * F.least(ml / F.lit(8.0), F.lit(1.0))
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1].

    0.4·alpha_ratio + 0.3·(1 − |stop_ratio − 0.4|) + 0.3·min(mean_len/8, 1):
    rewards mostly-alphabetic text, a natural function-word rate (~40 %),
    and non-trivial word length. Deterministic float64 arithmetic — the
    DuckDB oracle reproduces it bit-for-bit. Convenience form; corpus
    scans should stage the token array and ratios once and use
    :func:`quality_score_from_parts` (the tokenize subtree is otherwise
    re-evaluated per component).
    """
    # NULL text ≡ empty text: a low score, never NULL (see
    # alpha_ratio's junk-filter rationale)
    t = F.coalesce(text, F.lit(""))
    toks = ws_tokens(t)
    return quality_score_from_parts(
        alpha_ratio(t), stopword_ratio(toks), mean_token_len(toks)
    )


def lang_marker_hits(tokens: Column, lang: str) -> Column:
    """Number of tokens that are marker function words of ``lang``."""
    markers = F.lit(list(LANG_MARKERS[lang]))
    return F.size(F.filter(tokens, lambda t: F.array_contains(markers, t))).cast("long")


def lang_id(tokens: Column) -> Column:
    """Predicted language code by marker-word vote, alphabetical tie-break.

    Expressed as a greatest/CASE chain (not argmax over a map) so the same
    text appears in the SQL oracle.
    """
    hits = {lang: lang_marker_hits(tokens, lang) for lang in sorted(LANG_MARKERS)}
    top = F.greatest(*hits.values())
    expr = None
    for lang in sorted(LANG_MARKERS):  # alphabetical => first match wins ties
        cond = hits[lang] == top
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def fingerprint_of_codes(codes: Column) -> Column:
    """Rabin–Karp fold over a MATERIALIZED token-hash array column.

    fold: acc_0 = h_0;  acc_i = (acc_{i-1} * 31 + h_i) mod 1e9+7.
    Seeding with the first element (not 0) matches DuckDB's
    ``list_reduce`` so the oracle is the literal same fold. ``codes``
    should be a staged column reference — it is read 3 times (head,
    tail, size); an inline expression would be re-derived each time.
    """
    # guard the empty array: slice with length -1 raises at runtime and
    # ws_tokens never produces [] ([''] for empty text) but staged
    # upstream tokenizers may — null fingerprint for no tokens
    head = F.element_at(codes, 1)
    tail = F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0)))
    fold = F.aggregate(
        tail,
        head,
        lambda acc, h: (acc * F.lit(FP_BASE) + h) % F.lit(FP_MOD),
    )
    return F.when(F.size(codes) > 0, fold)


def fingerprint(text: Column) -> Column:
    """Rabin–Karp rolling-hash fingerprint over whitespace tokens.

    Convenience form over raw text; for corpus-scale scans stage
    ``transform(ws_tokens(text), md5_int32)`` in its own projection and
    call :func:`fingerprint_of_codes` on the column reference.
    """
    return fingerprint_of_codes(F.transform(ws_tokens(text), md5_int32))
