"""Configurable full-text analyzers: tokenizers + filter chains.

Parity: the reference's analyzer stack —
  tokenizers BLANK/CAMEL/CLASS/PUNCT  core/src/sql/tokenizer.rs:8-13,
                                      core/src/idx/ft/analyzer/tokenizer.rs
  filters ASCII/LOWERCASE/UPPERCASE/NGRAM/EDGENGRAM/SNOWBALL/MAPPER
                                      core/src/sql/filter.rs:8-16,
                                      core/src/idx/ft/analyzer/filter.rs
  mapper TSV format (word<TAB>term)   core/src/idx/ft/analyzer/mapper.rs

Spark-first shape: an Analyzer compiles to ONE Column expression —
boundary-insertion regexes (camel/class) + one split + per-term HOF
transforms. N-gram expansion is a nested `transform(sequence(...))`, never
an unrolled per-position chain (Catalyst tree stays O(1) in string length).
Only ASCII folding and SNOWBALL stemming drop to Arrow-batched pandas UDFs
(Unicode normalization and the Porter algorithm aren't expressible as
column algebra).  MAPPER becomes a map-literal lookup — the driver-loaded
dict is broadcast with the plan, the per-term lookup stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEP = "\x1f"  # unit-separator: token-boundary marker, never in real text

# boundary-insertion patterns (Java regex, lookaround only — zero-width)
_CAMEL_BOUNDARY = r"(?<=\p{Ll})(?=\p{Lu})"
_CLASS_BOUNDARY = (
    r"(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})"
    r"|(?<=[\p{L}\p{N}])(?=[\p{P}\p{S}])|(?<=[\p{P}\p{S}])(?=[\p{L}\p{N}])"
)



@F.pandas_udf(T.ArrayType(T.StringType()))
def _ascii_fold(arr: pd.Series) -> pd.Series:
    import unicodedata

    def fold(t: str) -> str:
        return "".join(
            c for c in unicodedata.normalize("NFD", t)
            if not unicodedata.combining(c)
        )

    return pd.Series(
        [None if a is None else [fold(t) for t in a] for a in arr],
        dtype="object",
    )


# -- Porter stemmer (public-domain algorithm, Porter 1980) --------------------
# The reference stems via rust_stemmers Snowball; Snowball-English is
# Porter2.  This is classic Porter — near-identical on common vocabulary;
# non-English languages pass through unstemmed (documented limitation).

_VOWELS = "aeiou"


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    m, prev_c = 0, True
    for i in range(len(w)):
        c = _cons(w, i)
        if prev_c and not c:
            pass
        elif not prev_c and c:
            m += 1
        prev_c = c
    return m


def _has_vowel(w: str) -> bool:
    return any(not _cons(w, i) for i in range(len(w)))


def _ends_cvc(w: str) -> bool:
    return (
        len(w) >= 3
        and _cons(w, len(w) - 3)
        and not _cons(w, len(w) - 2)
        and _cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif (w.endswith("ed") and _has_vowel(w[:-2])) or (
        w.endswith("ing") and _has_vowel(w[:-3])
    ):
        w = w[:-2] if w.endswith("ed") else w[:-3]
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif (
            len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)
            and w[-1] not in "lsz"
        ):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            if _measure(w[:-3]) > 1:
                w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _measure(stem) > 1 or (_measure(stem) == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if len(w) >= 2 and w[-1] == "l" and w[-2] == "l" and _measure(w) > 1:
        w = w[:-1]
    return w


@F.pandas_udf(T.ArrayType(T.StringType()))
def _stem_english(arr: pd.Series) -> pd.Series:
    return pd.Series(
        [None if a is None else [porter_stem(t) for t in a] for a in arr],
        dtype="object",
    )


_SNOWBALL_LANGS = {"english", "en"}


# -- the analyzer -------------------------------------------------------------


class Analyzer:
    """DEFINE ANALYZER equivalent: tokenizer set + ordered filter chain.

    ``filters`` entries: "ascii" | "lowercase" | "uppercase"
      | ("ngram", min, max) | ("edgengram", min, max)
      | ("snowball", lang) | ("mapper", path).
    """

    def __init__(self, tokenizers=("blank", "punct"),
                 filters=("lowercase",), name: str | None = None):
        self.name = name
        self.tokenizers = [t.lower() for t in tokenizers]
        self.filters = [
            (f.lower(),) if isinstance(f, str) else
            (f[0].lower(), *f[1:]) for f in filters
        ]
        unknown = set(self.tokenizers) - {"blank", "camel", "class", "punct"}
        if unknown:
            raise ValueError(f"unknown tokenizers: {sorted(unknown)}")
        self._mappers: dict[str, dict[str, str]] = {}
        for f in self.filters:
            if f[0] == "mapper":
                self._mappers[f[1]] = _load_mapper(f[1])
            elif f[0] == "snowball" and str(f[1]).lower() not in _SNOWBALL_LANGS:
                raise NotImplementedError(
                    f"SNOWBALL({f[1]}): only English stemming is bundled "
                    "(reference uses rust_stemmers; other languages pass "
                    "through unstemmed if you subclass)"
                )
            elif f[0] not in ("ascii", "lowercase", "uppercase", "ngram",
                              "edgengram", "snowball", "mapper"):
                raise ValueError(f"unknown filter {f[0]!r}")

    # tokenization ----------------------------------------------------------

    def tokens(self, col: Column | str, querying: bool = False) -> Column:
        """``querying=True`` skips Ngram/EdgeNgram filters — the reference
        analyzes queries without them (idx/ft/analyzer/filter.rs:78-84
        FilteringStage::Querying), so `@@ 'el'` queries one term 'el'
        against ngram-indexed documents."""
        s = F.col(col) if isinstance(col, str) else col
        if "camel" in self.tokenizers:
            s = F.regexp_replace(s, _CAMEL_BOUNDARY, _SEP)
        if "class" in self.tokenizers:
            s = F.regexp_replace(s, _CLASS_BOUNDARY, _SEP)
        if "punct" in self.tokenizers:
            # punct_role: each punctuation char is an IsolatedToken
            # (idx/ft/analyzer/tokenizer.rs:380-388) — kept as a token,
            # not dropped as a separator
            s = F.regexp_replace(s, r"([\p{P}\p{S}])", _SEP + "$1" + _SEP)
        classes = _SEP
        if "blank" in self.tokenizers or "class" in self.tokenizers:
            # blank_role / class_role: Whitespace is NotTokenizable
            # (tokenizer.rs:355-378) — a separator, never a token
            classes += r"\s"
        arr = F.split(s, f"[{classes}]+")
        arr = F.filter(arr, lambda x: x != "")
        for f in self.filters:
            if querying and f[0] in ("ngram", "edgengram"):
                continue
            arr = self._apply(arr, f)
        return F.filter(arr, lambda x: x.isNotNull() & (x != ""))

    __call__ = tokens

    # filters ---------------------------------------------------------------

    def _apply(self, arr: Column, f: tuple) -> Column:
        kind = f[0]
        if kind == "lowercase":
            return F.transform(arr, F.lower)
        if kind == "uppercase":
            return F.transform(arr, F.upper)
        if kind == "ascii":
            return _ascii_fold(arr)
        if kind == "snowball":
            return _stem_english(arr)
        if kind == "ngram":
            lo, hi = int(f[1]), int(f[2])
            return F.flatten(F.transform(arr, lambda t: _ngrams(t, lo, hi)))
        if kind == "edgengram":
            lo, hi = int(f[1]), int(f[2])
            return F.flatten(F.transform(arr, lambda t: _edgengrams(t, lo, hi)))
        if kind == "mapper":
            m = self._mappers[f[1]]
            if not m:
                return arr
            pairs = [F.lit(x) for kv in m.items() for x in kv]
            mcol = F.create_map(*pairs)
            return F.transform(
                arr, lambda t: F.coalesce(F.element_at(mcol, t), t)
            )
        raise AssertionError(kind)


def _ngrams(t: Column, lo: int, hi: int) -> Column:
    """All substrings of length lo..hi (term dropped if shorter than lo —
    sequence guard keeps F.sequence ascending)."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(lo), F.lit(hi)),
            lambda n: F.when(
                F.length(t) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - n + 1),
                    lambda i: F.substring(t, i, n.cast("int")),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )


def _edgengrams(t: Column, lo: int, hi: int) -> Column:
    """Prefixes of length lo..min(hi, len)."""
    return F.when(
        F.length(t) >= lo,
        F.transform(
            F.sequence(F.lit(lo), F.least(F.lit(hi), F.length(t))),
            lambda n: F.substring(t, F.lit(1), n.cast("int")),
        ),
    ).otherwise(F.array().cast("array<string>"))


# base dir for relative mapper paths — the reference runner resolves them
# against its working directory (the language-tests crate dir); the golden
# harness sets this to the corpus root's crate dir
MAPPER_BASE: str | None = None


def _load_mapper(path: str) -> dict[str, str]:
    """mapper.rs TSV: `word<TAB>term` per line → {term: word}."""
    import os as _os

    if not _os.path.isabs(path) and not _os.path.exists(path) \
            and MAPPER_BASE:
        cand = _os.path.normpath(_os.path.join(MAPPER_BASE, path))
        if _os.path.exists(cand):
            path = cand
    if not _os.path.exists(path):
        # classified engine error, not a raw IO crash (mapper.rs read err)
        raise ValueError(f"The analyzer mapper file '{path}' was not found")
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for ln, line in enumerate(fh):
            line = line.rstrip("\n")
            if not line:
                continue
            word, tab, rest = line.partition("\t")
            if not tab or "\t" in rest:
                raise ValueError(f"mapper line {ln}: expected exactly one tab")
            out[rest.strip()] = word.strip()
    return out


# -- named-analyzer registry (DEFINE ANALYZER) --------------------------------

ANALYZERS: dict[str, Analyzer] = {}


# analyzers whose FUNCTION preprocessing hook is unresolved: the DEFINE
# succeeds, USE raises (define/analyzer.rs lazy validation —
# search_invalid_function_name.surql)
POISONED: dict[str, str] = {}


def define_analyzer(name: str, tokenizers=("blank", "punct"),
                    filters=("lowercase",), poison: str | None = None,
                    function: str | None = None) -> Analyzer:
    a = Analyzer(tokenizers, filters, name=name)
    # FUNCTION preprocessing hook (define/analyzer.rs): text runs through
    # fn::<function> before tokenization; must return a string
    a.function = function
    ANALYZERS[name] = a
    if poison:
        POISONED[name] = poison
    else:
        POISONED.pop(name, None)
    return a


def get_analyzer(name: str) -> Analyzer:
    if name in POISONED:
        raise ValueError(
            f"The function '{POISONED[name]}' does not exist")
    return ANALYZERS[name]


def remove_analyzer(name: str) -> None:
    """REMOVE ANALYZER (statements/remove/analyzer.rs)."""
    del ANALYZERS[name]


# the reference's default-ish analyzer (round-1 `words()` behavior)
define_analyzer("default", ("blank", "punct"), ("lowercase",))
