"""Text analysis for large-scale corpus pipelines: tokenization, language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Analyzer lineage: the reference's full-text analyzers (tokenizers
BLANK/CAMEL/CLASS/PUNCT + filters LOWERCASE/NGRAM/..., core/src/sql/
tokenizer.rs:8, core/src/idx/ft/analyzer/) — here the BLANK+PUNCT+LOWERCASE
pipeline is one regex split, kept as a JVM-side expression (no UDF).

Everything is a deterministic Column expression: integer folds are
order-independent, double math shares one expression tree with the SQL
oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[^a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Analyzer: lowercase, split on non-alphanumerics, drop empties."""
    return F.filter(F.split(F.lower(_c(col)), WORD_RE), lambda x: x != "")


def distinct_words(col: Column | str) -> Column:
    return F.array_distinct(words(col))


def token_count(col: Column | str) -> Column:
    """Whitespace/punct token count (BPE-ish regex tokenizer stand-in)."""
    return F.size(words(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles (for MinHash/fingerprint dedup).

    Guarded: fewer than n words → empty array (F.sequence(1, 0) would
    otherwise produce a DESCENDING sequence, not an empty one).
    """
    w = words(col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.when(F.size(w) >= n, make).otherwise(F.array().cast("array<string>"))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(_c(col)), WORD_RE, " ")))


# -- language ID -------------------------------------------------------------

# Marker-word lists per language (n-gram-heuristic analogue).  The corpus is
# synthetic with one shared vocabulary, so the *mapping* is arbitrary — the
# operator semantics (per-language hit counts + deterministic argmax) are
# what's exercised.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "row", "scan", "slow"],
    "de": ["agg", "hash", "sort", "key"],
    "fr": ["window", "query", "order", "value"],
    "es": ["data", "stream", "small", "big"],
    "zh": ["join", "batch", "merge", "table"],
}


def lang_hit_count(col: Column | str, markers: list[str]) -> Column:
    """Number of tokens (with repeats) that are in the marker list."""
    return F.size(F.filter(words(col), lambda w: w.isin(*markers)))


def lang_id(col: Column | str, lang_markers: dict[str, list[str]] | None = None) -> Column:
    """Argmax over marker-hit counts; ties break in dict order."""
    lm = lang_markers or LANG_MARKERS
    counts = {lang: lang_hit_count(col, m) for lang, m in lm.items()}
    langs = list(lm)
    expr = F.lit(langs[-1])
    # Build CASE from the last language backwards so earlier langs win ties.
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        cond = None
        for other in langs[i + 1 :]:
            c = counts[lang] >= counts[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


# -- quality scoring ---------------------------------------------------------

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic quality features (all int folds + fixed double tree)."""
    c = _c(col)
    w = words(c)
    n_words = F.size(w).cast("double")
    n_chars = F.length(c).cast("double")
    sum_word_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double")
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "avg_word_len": sum_word_len / n_words,
        "stopword_ratio": stop_hits / n_words,
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1]-ish score: length credit + lexical shape."""
    f = quality_features(col)
    return (
        F.least(f["n_words"] / F.lit(80.0), F.lit(1.0)) * 0.4
        + F.least(f["avg_word_len"] / F.lit(6.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - f["stopword_ratio"]) * 0.3
    )
