"""string:: namespace (73 functions) — core/src/fnc/string.rs.

Native-first: Spark covers concat/contains/len/case/trim/split/replace/
slice/repeat/levenshtein/regex natively; the similarity family
(jaro/jaro_winkler/smith-waterman/sorensen-dice + damerau/osa distances)
and slug/html are vectorized Pandas UDFs (Arrow-batched — the sanctioned
slow path for genuinely-Python logic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


# -- native ------------------------------------------------------------------


def concat(*cols) -> Column:
    # args stringify via Value Display — NONE renders 'NONE', it does
    # not null out the whole result (fnc/string.rs concat)
    return F.concat(*[
        F.coalesce(_c(c).cast("string"), F.lit("NONE")) for c in cols])


def contains(s, sub) -> Column:
    return F.contains(_c(s), _c(sub))


def starts_with(s, p) -> Column:
    return F.startswith(_c(s), _c(p))


def ends_with(s, p) -> Column:
    return F.endswith(_c(s), _c(p))


def join(sep, *cols) -> Column:
    return F.concat_ws(sep, *[_c(c) for c in cols])


def len_(s) -> Column:
    """string::len — character count (reference counts chars, not bytes)."""
    return F.length(_c(s))


def lowercase(s) -> Column:
    return F.lower(_c(s))


def uppercase(s) -> Column:
    return F.upper(_c(s))


def capitalize(s) -> Column:
    """string::capitalize — uppercase each letter following whitespace (or
    start); all other characters untouched, so "ALREADY UPPERCASE" survives
    (fnc/string.rs:45-64; initcap would lowercase the rest)."""
    segs = F.split(_c(s), r"(?<=\s)")  # zero-width split after any whitespace
    cap = F.transform(
        segs,
        lambda w: F.concat(
            F.upper(w.substr(F.lit(1), F.lit(1))),
            w.substr(F.lit(2), F.greatest(F.length(w) - 1, F.lit(0))),
        ),
    )
    return F.array_join(cap, "")


def repeat(s, n: int) -> Column:
    return F.repeat(_c(s), n)


def replace(s, old, new) -> Column:
    return F.replace(_c(s), _c(old), _c(new))


def reverse(s) -> Column:
    return F.reverse(_c(s))


def slice_(s, start=None, end=None) -> Column:
    """string::slice — Python-style [start:end) character slice, negative
    indices count from the end; 1-arg form returns the whole string
    (fnc/string.rs:171-199, TypedRange Included..Excluded)."""
    c = _c(s)
    if start is None:
        return c
    n = F.length(c)
    st = (_c(start) if isinstance(start, Column) else F.lit(int(start))).cast("int")
    en = n if end is None else (
        _c(end) if isinstance(end, Column) else F.lit(int(end))
    ).cast("int")
    st = F.when(st < 0, F.greatest(n + st, F.lit(0))).otherwise(F.least(st, n))
    en = F.when(en < 0, F.greatest(n + en, F.lit(0))).otherwise(F.least(en, n))
    return c.substr(st + 1, F.greatest(en - st, F.lit(0)))


def split(s, sep) -> Column:
    # Literal separator: escape regex metacharacters for F.split.
    import re

    return F.split(_c(s), re.escape(sep) if isinstance(sep, str) else sep)


def trim(s) -> Column:
    return F.trim(_c(s))


def words(s) -> Column:
    return F.filter(F.split(_c(s), r"\s+"), lambda x: x != "")


def matches(s, regex: str) -> Column:
    """string::matches — regex test."""
    return _c(s).rlike(regex)


def slug(s) -> Column:
    """string::slug — lowercase, alphanumeric runs joined by dashes."""
    cleaned = F.regexp_replace(F.lower(_c(s)), r"[^a-z0-9]+", "-")
    return F.regexp_replace(cleaned, r"(^-+)|(-+$)", "")


# -- string::distance:: ------------------------------------------------------


def levenshtein(a, b) -> Column:
    return F.levenshtein(_c(a), _c(b))


def hamming(a, b) -> Column:
    """Equal-length char mismatch count (NULL when lengths differ)."""
    a, b = _c(a), _c(b)
    diff = F.aggregate(
        F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(F.length(a) == F.length(b), diff)


@F.pandas_udf(T.IntegerType())
def damerau(a: pd.Series, b: pd.Series) -> pd.Series:
    """Damerau-Levenshtein (unrestricted) — Pandas UDF."""

    def d(s: str, t: str) -> int:
        if s is None or t is None:
            return None
        da, maxd = {}, len(s) + len(t)
        H = [[maxd] * (len(t) + 2) for _ in range(len(s) + 2)]
        for i in range(len(s) + 1):
            H[i + 1][1] = i
        for j in range(len(t) + 1):
            H[1][j + 1] = j
        for i in range(1, len(s) + 1):
            db = 0
            for j in range(1, len(t) + 1):
                k, l_ = da.get(t[j - 1], 0), db
                cost = 0 if s[i - 1] == t[j - 1] else 1
                if cost == 0:
                    db = j
                H[i + 1][j + 1] = min(
                    H[i][j] + cost,
                    H[i + 1][j] + 1,
                    H[i][j + 1] + 1,
                    H[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
                )
            da[s[i - 1]] = i
        return H[len(s) + 1][len(t) + 1]

    return pd.Series([d(x, y) for x, y in zip(a, b)], dtype="object")


# -- string::similarity:: ----------------------------------------------------


def _jaro(s: str, t: str) -> float:
    if s is None or t is None:
        return None
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    sm, tm = [False] * ls, [False] * lt
    m = 0
    for i in range(ls):
        for j in range(max(0, i - window), min(lt, i + window + 1)):
            if not tm[j] and s[i] == t[j]:
                sm[i] = tm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = t_count = 0
    for i in range(ls):
        if sm[i]:
            while not tm[k]:
                k += 1
            if s[i] != t[k]:
                t_count += 1
            k += 1
    return (m / ls + m / lt + (m - t_count / 2) / m) / 3


@F.pandas_udf(T.DoubleType())
def jaro(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_jaro(x, y) for x, y in zip(a, b)], dtype="object")


@F.pandas_udf(T.DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    def jw(s, t):
        j = _jaro(s, t)
        if j is None:
            return None
        prefix = 0
        for x, y in zip(s[:4], t[:4]):
            if x != y:
                break
            prefix += 1
        return j + prefix * 0.1 * (1 - j)

    return pd.Series([jw(x, y) for x, y in zip(a, b)], dtype="object")


@F.pandas_udf(T.DoubleType())
def sorensen_dice(a: pd.Series, b: pd.Series) -> pd.Series:
    def sd(s, t):
        if s is None or t is None:
            return None
        bs = {s[i : i + 2] for i in range(len(s) - 1)}
        bt = {t[i : i + 2] for i in range(len(t) - 1)}
        if not bs and not bt:
            return 1.0
        return 2 * len(bs & bt) / (len(bs) + len(bt))

    return pd.Series([sd(x, y) for x, y in zip(a, b)], dtype="object")


@F.pandas_udf(T.DoubleType())
def smithwaterman(a: pd.Series, b: pd.Series) -> pd.Series:
    def sw(s, t, match=2, mismatch=-1, gap=-1):
        if s is None or t is None:
            return None
        best = 0
        prev = [0] * (len(t) + 1)
        for i in range(1, len(s) + 1):
            cur = [0] * (len(t) + 1)
            for j in range(1, len(t) + 1):
                sc = match if s[i - 1] == t[j - 1] else mismatch
                cur[j] = max(0, prev[j - 1] + sc, prev[j] + gap, cur[j - 1] + gap)
                best = max(best, cur[j])
            prev = cur
        return float(best)

    return pd.Series([sw(x, y) for x, y in zip(a, b)], dtype="object")


# -- string::is:: ------------------------------------------------------------

_IS_PATTERNS = {
    "alpha": r"^[A-Za-z]+$",
    "alphanum": r"^[A-Za-z0-9]+$",
    "ascii": r"^[\x00-\x7F]+$",  # empty string is NOT ascii (is.rs)
    "numeric": r"^[+-]?\d+(\.\d+)?$",
    "hexadecimal": r"^(0x)?[0-9a-fA-F]+$",
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "domain": r"^([a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}$",
    "url": r"^https?://[^\s]+$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "ulid": r"^[0-7][0-9A-HJKMNP-TV-Z]{25}$",
    "ip": r"^((\d{1,3}\.){3}\d{1,3}|([0-9a-fA-F:]+:+[0-9a-fA-F:]*))$",
    "ipv4": r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$",
    "ipv6": r"^([0-9a-fA-F]{0,4}:){2,7}[0-9a-fA-F]{0,4}$",
    "semver": r"^\d+\.\d+\.\d+(-[0-9A-Za-z.-]+)?(\+[0-9A-Za-z.-]+)?$",
    "record": r"^[A-Za-z0-9_]+:.+$",
    "datetime": r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:?\d{2})?)?$",
    "latitude": r"^[+-]?([0-8]?\d(\.\d+)?|90(\.0+)?)$",
    "longitude": r"^[+-]?((1[0-7]\d|0?\d?\d)(\.\d+)?|180(\.0+)?)$",
}


def is_(kind: str, s) -> Column:
    """string::is::<kind> predicates (string.rs `is::` submodule)."""
    return _c(s).rlike(_IS_PATTERNS[kind])


# -- string::semver:: --------------------------------------------------------


def semver_part(s, part: str) -> Column:
    """semver::{major,minor,patch} extraction."""
    idx = {"major": 1, "minor": 2, "patch": 3}[part]
    return F.regexp_extract(_c(s), r"^(\d+)\.(\d+)\.(\d+)", idx).cast("bigint")


def semver_compare(a, b) -> Column:
    """-1/0/1 ordering on (major, minor, patch)."""
    ka = F.struct(*[semver_part(a, p) for p in ("major", "minor", "patch")])
    kb = F.struct(*[semver_part(b, p) for p in ("major", "minor", "patch")])
    return F.when(ka < kb, -1).when(ka > kb, 1).otherwise(0)


# -- html --------------------------------------------------------------------


def html_encode(s) -> Column:
    out = _c(s)
    for ch, ent in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#39;")]:
        out = F.replace(out, F.lit(ch), F.lit(ent))
    return out


def html_sanitize(s) -> Column:
    """Strip tags (coarse, regex-based — matches reference intent)."""
    return F.regexp_replace(_c(s), r"<[^>]*>", "")
