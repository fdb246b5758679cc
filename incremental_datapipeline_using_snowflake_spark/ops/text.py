"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Column-expression compositions (JVM-side, codegen'd —
no Python UDFs in the hot path), so they scale linearly over a 100 TB
``documents`` corpus: each is a narrow map over the text column with no
shuffle at all.

Operators: whitespace + BPE-ish token counting, quality scoring
(length/punctuation/stopword ratios), n-gram-stopword language ID, and
document fingerprinting (normalized md5 + polynomial rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queries.util import md5_long

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

# Small per-language stopword sets for the n-gram language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "you", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "auf"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    "fr": ["le", "les", "de", "et", "un", "est", "pour", "que", "dans", "avec"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]  # deterministic tie-break order


def words_col(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(t), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(words_col(text))


def bpe_token_count(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(BPE_TOKEN_RE))


def avg_token_len(text: Column | str) -> Column:
    w = words_col(text)
    total = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
    )
    return F.round(total / F.greatest(F.size(w), F.lit(1)), 4)


def char_class_ratio(text: Column | str, pattern: str) -> Column:
    """Fraction of characters matching ``pattern`` (e.g. non-alphanumeric)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(pattern)) / F.greatest(F.length(t), F.lit(1))


def stopword_hits(text: Column | str, lang: str) -> Column:
    w = words_col(F.lower(F.col(text) if isinstance(text, str) else text))
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(w, lambda x: F.array_contains(sw, x)))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality score from length / punctuation / stopword
    signals (the standard pre-training quality-filter shape)."""
    n_tok = token_count(text)
    nonalnum = char_class_ratio(text, r"[^A-Za-z0-9\s]")
    stop_ratio = stopword_hits(text, "en") / F.greatest(n_tok, F.lit(1))
    return F.round(
        F.lit(0.4) * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(nonalnum * 4, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 6, F.lit(1.0)),
        4,
    )


def quality_bucket(score: Column) -> Column:
    return (
        F.when(score >= 0.8, "high").when(score >= 0.5, "medium").otherwise("low")
    )


def lang_id(text: Column | str) -> Column:
    """Stopword-hit argmax language guess; no hits -> 'und'.

    Tie-break follows LANG_PRIORITY order (en > de > es > fr) so the result
    is deterministic and SQL-reproducible.
    """
    hits = {lg: stopword_hits(text, lg) for lg in LANG_PRIORITY}
    best = F.greatest(*hits.values())
    expr = F.when(best == 0, "und")
    for lg in LANG_PRIORITY:
        expr = expr.when(hits[lg] == best, lg)
    return expr


ROLLING_MOD = 1 << 40  # keep acc*31 + h inside BIGINT
TOKEN_HASH_MOD = 1_000_000_007


def fingerprint_md5(text: Column | str) -> Column:
    """md5 of the whitespace-normalized, lowercased text."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "))


def fingerprint_rolling(text: Column | str) -> Column:
    """Polynomial rolling hash over per-token md5 hashes:
    ``fold(tokens, acc = (acc*31 + md5_60bit(tok) % 1e9+7) % 2^40)`` —
    order-sensitive (unlike a bag-of-words hash) yet portable to the oracle."""
    hashes = F.transform(words_col(text), lambda w: md5_long(w) % TOKEN_HASH_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(ROLLING_MOD).cast("long"),
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: token stats + quality + language + fingerprints."""
    score = quality_score(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "n_bpe_tokens": bpe_token_count(text_col),
            "avg_token_len": avg_token_len(text_col),
            "quality": score,
            "quality_tier": quality_bucket(score),
            "pred_lang": lang_id(text_col),
            "fp_md5": fingerprint_md5(text_col),
            "fp_rolling": fingerprint_rolling(text_col),
        }
    )
