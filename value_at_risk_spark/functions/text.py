"""Text-analysis column expressions (north-star surface, BASELINE.json).

Not present in the reference (its string surface is equality only —
SURVEY §2.8 "Not present"); these are the engine's training-data-
pipeline additions: tokenization, quality scoring, language-ID
heuristics, token counting. All pure Catalyst expressions — at 100 TB
these run inside whole-stage codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed English-stopword list (deterministic; mirrored in the
# DuckDB oracle SQL verbatim).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Word-ish tokens: runs of lowercase alphanumerics.
TOKEN_PATTERN = "[a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text, empty strings removed."""
    return F.filter(F.split(F.lower(_c(text)), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def regex_token_count(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """BPE-ish token proxy: count of regex token matches (JVM-side)."""
    return F.regexp_count(F.lower(_c(text)), F.lit(pattern))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords — a classic quality signal."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence + type/token ratio. A stand-in for trained quality
    classifiers in LLM data pipelines."""
    n = token_count(text)
    ttr = distinct_token_count(text) / F.greatest(n, F.lit(1))
    length_ok = F.when((n >= 10) & (n <= 10_000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((length_ok + sw_ok + ttr) / F.lit(3.0), 6)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings (dedup fingerprint input)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
