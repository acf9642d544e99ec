"""Text-analysis operators for large-scale training-data pipelines:
tokenization, language-ID heuristic, quality scoring, document
fingerprinting.

Not part of the reference surface (hstreamdb/hstream has no text ops);
these are the LLM-data-pipeline extensions. Every operator is built
from JVM-side Catalyst expressions (split/filter/aggregate/md5) — no
Python UDFs — so they run at full codegen speed over 100 TB of
documents and scale linearly: tokenize/score are map-only (no
shuffle); fingerprinting is a pure projection.

All hashing is engine-agnostic (md5-derived integers), so results are
reproducible bit-for-bit across Spark, DuckDB, or any SQL engine —
which is also how the correctness oracle validates them.
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1, Mersenne prime — keeps fold arithmetic in int64
FNV_B = 31  # fold multiplier for the rolling fingerprint

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deterministic, closed vocabulary.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "los", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "que", "est"),
    "zh": ("de", "le", "shi", "bu", "wo", "ta"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer: contraction suffixes, letter runs, digit
# runs, punctuation runs, residual whitespace — the BPE-ish segmentation
# whose match count approximates a subword-token count.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def subword_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer segments (JVM-side
    regexp_count — no UDF)."""
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def token_hash(tok: Column) -> Column:
    """Engine-agnostic 31-bit token hash: first 60 bits of md5, mod 2^31-1."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % P31


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over token hashes, mod 2^31-1.

    h_0 = 0; h_i = (h_{i-1} * 31 + hash(tok_i)) mod p — order-sensitive,
    so token reordering changes the fingerprint (unlike bag-of-words).
    Pure projection: map-only at any scale.
    """
    hashes = F.transform(tokens(text), token_hash)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FNV_B + h) % P31,
    )


# union of all language marker words — the deterministic stopword list
STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


def stopword_ratio(text: Column) -> Column:
    """Fraction of (lowercased) tokens that are stopwords — high-quality
    prose sits in a band; near-0 suggests keyword spam / non-language,
    near-1 suggests boilerplate. Map-only."""
    toks = tokens(F.lower(text))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(F.lit(list(STOPWORDS)), t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]:

    0.4 * min(n_tokens/50, 1)            — length credit
    + 0.3 * (1 - punct_ratio)            — low punctuation density
    + 0.3 * distinct_token_ratio        — vocabulary diversity
    """
    toks = tokens(text)
    n = F.size(toks)
    n_d = n.cast("double")
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    punct_ratio = punct.cast("double") / F.length(text).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_d
    length_credit = F.least(n_d / F.lit(50.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_credit
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * distinct_ratio
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-token counts (the n-gram heuristic's evidence)."""
    toks = tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.lit(list(markers))
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker count, ties broken by language
    code ascending ('und' when no marker hits at all)."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        # iterate in reverse-alpha order with >= so that the final winner
        # is the alphabetically-first among maxima
        cond = s >= best_score
        best_lang = F.when((s > 0) & cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def _bit(col: Column, b: int) -> Column:
    return F.shiftright(col, b).bitwiseAND(F.lit(1))


def simhash_bits() -> int:
    return 32


def simhash_weights(text: Column) -> Column:
    """Token-hash array used by the SimHash aggregation (see dedup.simhash)."""
    return F.transform(tokens(text), token_hash)
