"""array:: namespace (62 functions) — core/src/fnc/array.rs (1040 LoC).

All native Column expressions (builtins + higher-order functions); closures
(array::map/filter/fold with |$x| bodies, core/src/expr/closure.rs:12) are
Python lambdas producing Column trees — same "closure compiles to
expression" design as the reference's new executor.

0-based indexing follows the reference; Spark's element_at is 1-based, so
helpers shift.  Functions whose reference semantics error on bad input
return NULL instead (Spark convention, documented divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


# -- basics ------------------------------------------------------------------


def add(arr, v) -> Column:
    """array::add — append if not present (set-insert)."""
    arr, v = _c(arr), _c(v)
    return F.when(F.array_contains(arr, v), arr).otherwise(F.array_append(arr, v))


def append(arr, v) -> Column:
    return F.array_append(_c(arr), _c(v))


def prepend(arr, v) -> Column:
    return F.array_prepend(_c(arr), _c(v))


def push(arr, v) -> Column:
    return F.array_append(_c(arr), _c(v))


def pop(arr) -> Column:
    """array::pop — the last element (Vec::pop semantics, fnc/array.rs:603);
    NONE on empty."""
    a = _c(arr)
    return F.when(F.size(a) > 0, F.element_at(a, -1))


def _int_idx(idx, name: str = "index") -> int:
    """Coerce a numeric index to int (the reference coerce_to::<i64> accepts
    integral floats; fnc/args.rs)."""
    if isinstance(idx, float):
        if not idx.is_integer():
            raise ValueError(f"non-integral {name}: {idx}")
        return int(idx)
    return int(idx)


def insert(arr, v, idx: int | None = None) -> Column:
    """array::insert — 0-based position insert; no index = append; negative
    counts from the back; out-of-range returns the array unaltered
    (fnc/array.rs:437-458)."""
    a, vv = _c(arr), _c(v)
    if idx is None:
        return F.array_append(a, vv)
    idx = _int_idx(idx)
    n = F.size(a)
    pos = (F.lit(idx) + (F.lit(0) if idx >= 0 else n)).cast("int")
    return F.when((pos < 0) | (pos > n), a).otherwise(
        F.concat(F.slice(a, 1, pos), F.array(vv), F.slice(a, pos + 1, n - pos))
    )


def remove(arr, idx: int) -> Column:
    """array::remove — drop the element at 0-based index (negative counts
    from the end, fnc/array.rs)."""
    a = _c(arr)
    if idx < 0:
        pos = F.size(a) + F.lit(idx)  # 0-based position from the end
        return F.when(
            pos >= 0, F.concat(F.slice(a, 1, pos), F.slice(a, pos + 2, F.size(a)))
        ).otherwise(a)
    return F.concat(F.slice(a, 1, idx), F.slice(a, idx + 2, F.size(a)))


def remove_value(arr, v) -> Column:
    """set::remove — drop all elements equal to v (fnc/set.rs:37; contrast
    array::remove, which drops by index)."""
    vv = _c(v)
    return F.filter(_c(arr), lambda x: ~x.eqNullSafe(vv))


def at(arr, idx: int) -> Column:
    """array::at — 0-based pick, negatives from the end; out-of-bounds is
    NONE (fnc/array.rs at → Value::None)."""
    idx = _int_idx(idx)
    return F.try_element_at(_c(arr), F.lit(idx + 1 if idx >= 0 else idx))


def first(arr) -> Column:
    return F.try_element_at(_c(arr), F.lit(1))


def last(arr) -> Column:
    return F.try_element_at(_c(arr), F.lit(-1))


def len_(arr) -> Column:
    return F.size(_c(arr))


def is_empty(arr) -> Column:
    return F.size(_c(arr)) == 0


def slice_(arr, start: int | None = None, end: int | None = None) -> Column:
    """array::slice — [start, end) by position; negative offsets count from
    the end; no args returns the array (fnc/array.rs:742-800 TypedRange)."""
    a = _c(arr)
    if start is None:
        return a
    n = F.size(a)
    start = _int_idx(start, "start")
    s = F.lit(start) if start >= 0 else F.greatest(n + F.lit(start), F.lit(0))
    if end is None:
        e = n
    else:
        end = _int_idx(end, "end")
        e = F.lit(end) if end >= 0 else F.greatest(n + F.lit(end), F.lit(0))
    return F.slice(a, (s + 1).cast("int"), F.greatest(e - s, F.lit(0)).cast("int"))


def reverse(arr) -> Column:
    return F.reverse(_c(arr))


def concat(*arrays) -> Column:
    """array::concat — variadic (fnc/array.rs Rest<Array>)."""
    if not arrays:
        raise ValueError("array::concat expects at least one array")
    if len(arrays) == 1:
        return _c(arrays[0])
    return F.concat(*[_c(a) for a in arrays])


def join(arr, sep) -> Column:
    """array::join — stringify each element first (set/array join use
    Value::into_raw_string; fnc/set.rs:227)."""
    return F.array_join(F.transform(_c(arr), lambda x: x.cast("string")), sep)


def fill(arr, v, start: int | None = None, end: int | None = None) -> Column:
    """array::fill(arr, v, [start], [end)) — whole array or the [start, end)
    position range; negative offsets from the end (fnc/array.rs:204)."""
    a, vv = _c(arr), _c(v)
    if start is None:
        return F.transform(a, lambda _: vv)
    n = F.size(a)
    start = _int_idx(start, "start")
    s = F.lit(start) if start >= 0 else F.greatest(n + F.lit(start), F.lit(0))
    if end is None:
        e = n
    else:
        end = _int_idx(end, "end")
        e = F.lit(end) if end >= 0 else F.greatest(n + F.lit(end), F.lit(0))
    return F.transform(a, lambda x, i: F.when((i >= s) & (i < e), vv).otherwise(x))


def repeat(v, n: int) -> Column:
    n = _int_idx(n, "count")
    if n < 0:
        raise ValueError("Incorrect arguments for function array::repeat():"
                         " count must be a non-negative integer")
    if n > _RANGE_LIMIT:
        raise ValueError("array::repeat output must not exceed 1048576 bytes")
    return F.array_repeat(_c(v), n)


# Reference output cap: 1 MiB of Value slots (fnc/array.rs `limit`); beyond
# it array::range/sequence error rather than materialize.
_RANGE_LIMIT = 1_048_576


def range_(start: int, end: int | None = None) -> Column:
    """array::range(start, end) — [start, end); also accepts a range literal
    via the compiler.  Unbounded or oversized output errors
    (fnc/array.rs:617-651)."""
    if end is None:
        raise ValueError("array::range output must not exceed 1048576 bytes")
    start, end = _int_idx(start, "start"), _int_idx(end, "end")
    if end - start > _RANGE_LIMIT:
        raise ValueError("array::range output must not exceed 1048576 bytes")
    if end <= start:
        return F.array().cast("array<bigint>")
    return F.sequence(F.lit(start), F.lit(end - 1))


def sequence(offset_len: int, length: int | None = None) -> Column:
    """array::sequence(len) / (offset, len) — len ints from offset (or 0);
    len <= 0 is empty; oversized errors (fnc/array.rs:653-666)."""
    if length is None:
        offset, length = 0, _int_idx(offset_len, "len")
    else:
        offset, length = _int_idx(offset_len, "offset"), _int_idx(length, "len")
    if length <= 0:
        return F.array().cast("array<bigint>")
    if length > _RANGE_LIMIT:
        raise ValueError("array::sequence output must not exceed 1048576 bytes")
    return F.sequence(F.lit(offset), F.lit(offset + length - 1))


def swap(arr, i: int, j: int) -> Column:
    """array::swap — negative indices count from the end; out-of-range
    raises (fnc/array.rs:895 range checks)."""
    a = _c(arr)
    i, j = _int_idx(i, "from"), _int_idx(j, "to")
    n = F.size(a)

    def _resolve(k: int, argno: int) -> Column:
        pos = F.lit(k) + F.when(F.lit(k < 0), n).otherwise(F.lit(0))
        return F.when(
            (pos < 0) | (pos >= n),
            F.raise_error(F.concat(
                F.lit(f"Incorrect arguments for function array::swap(). "
                      f"Argument {argno} is out of range. Expected a number "
                      f"between -"), n.cast("string"), F.lit(" and "),
                n.cast("string"))).cast("int"),
        ).otherwise(pos)

    pi, pj = _resolve(i, 1), _resolve(j, 2)
    return F.transform(
        a,
        lambda x, pos: F.when(pos == pi, F.element_at(a, pj + 1))
        .when(pos == pj, F.element_at(a, pi + 1))
        .otherwise(x),
    )


# -- set algebra (also the set:: namespace, core/src/fnc/set.rs) -------------


def distinct(arr) -> Column:
    return F.array_distinct(_c(arr))


def union(a, b) -> Column:
    return F.array_union(_c(a), _c(b))


def intersect(a, b) -> Column:
    return F.array_intersect(_c(a), _c(b))


def difference(a, b) -> Column:
    """array::difference — symmetric difference."""
    a, b = _c(a), _c(b)
    return F.array_union(F.array_except(a, b), F.array_except(b, a))


def complement(a, b) -> Column:
    """array::complement — a \\ b, keeping a's duplicates and order
    (fnc/array.rs complement retains the left array's shape;
    array_except would dedup)."""
    a, b = _c(a), _c(b)
    # exists + null-safe eq instead of array_contains: the latter rejects
    # NULL-typed elements (empty-set literals)
    return F.filter(a, lambda x: ~F.exists(b, lambda y: y.eqNullSafe(x)))


def combine(a, b) -> Column:
    """array::combine — all pairs [x, y] (cartesian)."""
    a, b = _c(a), _c(b)
    return F.flatten(F.transform(a, lambda x: F.transform(b, lambda y: F.array(x, y))))


# -- logic over boolean arrays ----------------------------------------------


def all_(arr) -> Column:
    """array::all — null/NONE elements are falsy, so a null `forall` verdict
    means some element wasn't truthy (fnc/array.rs all → Value::is_truthy)."""
    return F.coalesce(F.forall(_c(arr), lambda x: x.cast("boolean")), F.lit(False))


def any_(arr) -> Column:
    return F.coalesce(F.exists(_c(arr), lambda x: x.cast("boolean")), F.lit(False))


def _tf(x: Column) -> Column:
    """Truthiness with missing (shorter array → NULL) as false — the
    reference pads with Value::None, which is falsy (fnc/array.rs
    boolean_and/or/xor)."""
    return F.coalesce(x.cast("boolean"), F.lit(False))


def boolean_and(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _tf(x) & _tf(y))


def boolean_or(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _tf(x) | _tf(y))


def boolean_xor(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _tf(x) != _tf(y))


def boolean_not(arr) -> Column:
    return F.transform(_c(arr), lambda x: ~x.cast("boolean"))


def logical_and(a, b) -> Column:
    """Truthy-aware pairwise and: keeps the deciding value (reference
    returns values, not booleans)."""
    return F.zip_with(_c(a), _c(b), lambda x, y: F.when(x.cast("boolean"), y).otherwise(x))


def logical_or(a, b) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: F.when(x.cast("boolean"), x).otherwise(y))


def logical_xor(a, b) -> Column:
    return F.zip_with(
        _c(a),
        _c(b),
        lambda x, y: F.when(x.cast("boolean") & ~y.cast("boolean"), x)
        .when(y.cast("boolean") & ~x.cast("boolean"), y)
        .otherwise(F.lit(False)),
    )


# -- higher-order (closure-taking) ------------------------------------------


def map_(arr, fn) -> Column:
    return F.transform(_c(arr), fn)


def filter_(arr, fn) -> Column:
    """array/set filter — closure predicate, or plain value (keep equal
    elements; fnc/set.rs filter value arm)."""
    if not callable(fn):
        v = _c(fn)
        return F.filter(_c(arr), lambda x: x.eqNullSafe(v))
    return F.filter(_c(arr), fn)


def filter_index(arr, fn) -> Column:
    """Indices (0-based) where fn holds."""
    a = _c(arr)
    pairs = F.transform(a, lambda x, i: F.struct(x.alias("x"), i.alias("i")))
    return F.transform(
        F.filter(pairs, lambda s: fn(s.getField("x"))), lambda s: s.getField("i")
    )


def find(arr, fn) -> Column:
    return F.try_element_at(filter_(arr, fn), F.lit(1))


def find_index(arr, fn) -> Column:
    return F.try_element_at(filter_index(arr, fn), F.lit(1))


def includes(arr, v) -> Column:
    return F.array_contains(_c(arr), _c(v))


def index_of(arr, v) -> Column:
    """0-based first index of v, NULL if absent."""
    pos = F.array_position(_c(arr), _c(v))
    return F.when(pos > 0, pos - 1)


def every(arr, fn) -> Column:
    return F.forall(_c(arr), fn)


def some(arr, fn) -> Column:
    return F.exists(_c(arr), fn)


def fold(arr, init, fn) -> Column:
    return F.aggregate(_c(arr), _c(init), fn)


def reduce(arr, fn) -> Column:
    """Fold with the first element as the accumulator; empty input is NONE."""
    a = _c(arr)
    return F.aggregate(
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        F.try_element_at(a, F.lit(1)),
        fn,
    )


def matches(arr, v) -> Column:
    """array::matches — elementwise equality flags."""
    return F.transform(_c(arr), lambda x: x == _c(v))


# -- aggregate-ish -----------------------------------------------------------


def max_(arr) -> Column:
    return F.array_max(_c(arr))


def min_(arr) -> Column:
    return F.array_min(_c(arr))


def flatten(arr) -> Column:
    return F.flatten(_c(arr))


def group(arr) -> Column:
    """array::group — flatten + distinct."""
    return F.array_distinct(F.flatten(_c(arr)))


# -- sorting -----------------------------------------------------------------


def _asc(direction) -> bool:
    """Sort direction argument: true/'asc' ascending, false/'desc'
    descending (fnc/array.rs sort Optional<Value>)."""
    if isinstance(direction, str):
        return direction.lower() != "desc"
    return bool(direction)


def sort(arr, asc: bool | str = True) -> Column:
    a = F.array_sort(_c(arr))
    return a if _asc(asc) else F.reverse(a)


def sort_asc(arr) -> Column:
    return sort(arr, True)


def sort_desc(arr) -> Column:
    return sort(arr, False)


def _lexical_fold(s: str) -> str:
    """lexical-sort crate semantics: transliterate to ASCII-ish
    (NFKD, strip combining marks) then casefold."""
    import unicodedata

    return "".join(c for c in unicodedata.normalize("NFKD", s)
                   if not unicodedata.combining(c)).casefold()


def _natural_key(s: str, lexical: bool):
    """Digit runs compare numerically (and before text chunks); text
    chunks compare by code point — or lexically-folded when `lexical`
    (fnc/array.rs:863-893 natural_cmp / natural_lexical_cmp)."""
    import re as _re

    if lexical:
        s = _lexical_fold(s)
    key = []
    for p in _re.split(r"(\d+)", s):
        if not p:
            continue
        key.append((0, int(p), "") if p.isdigit() else (1, 0, p))
    return key


def _sort_udf(lexical: bool, natural: bool):
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _u(col):
        import pandas as pd

        def one(v):
            if v is None:
                return None
            items = ["" if x is None else str(x) for x in v]
            if natural:
                return sorted(items, key=lambda s: _natural_key(s, lexical))
            return sorted(items, key=_lexical_fold)

        return pd.Series([one(v) for v in col])

    return _u


def sort_lexical(arr, direction: bool | str = True) -> Column:
    """array::sort_lexical — locale-folded string ordering (the reference
    uses the lexical-sort crate's lexical_cmp)."""
    a = _sort_udf(lexical=True, natural=False)(
        _c(arr).cast("array<string>"))
    return a if _asc(direction) else F.reverse(a)


def sort_natural(arr, direction: bool | str = True) -> Column:
    """array::sort_natural — embedded digit runs compare numerically,
    text by code point."""
    a = _sort_udf(lexical=False, natural=True)(
        _c(arr).cast("array<string>"))
    return a if _asc(direction) else F.reverse(a)


def sort_natural_lexical(arr, direction: bool | str = True) -> Column:
    """array::sort_natural_lexical — numeric digit runs + folded text."""
    a = _sort_udf(lexical=True, natural=True)(
        _c(arr).cast("array<string>"))
    return a if _asc(direction) else F.reverse(a)


def shuffle(arr, seed: int = 42) -> Column:
    """array::shuffle — deterministic-by-seed permutation (md5 keys)."""
    a = _c(arr)
    pairs = F.transform(
        a,
        lambda x, i: F.struct(
            F.md5(F.concat(F.lit(str(seed)), F.lit(":"), i.cast("string"))).alias("k"),
            x.alias("v"),
        ),
    )
    return F.transform(F.array_sort(pairs), lambda s: s.getField("v"))


# -- shaping -----------------------------------------------------------------


def clump(arr, n: int) -> Column:
    """array::clump — chunks of size n."""
    a = _c(arr)
    n_chunks = F.ceil(F.size(a) / F.lit(n)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: F.slice(a, i * n + 1, n)
    )


def windows(arr, n: int) -> Column:
    """array::windows — sliding windows of size n (empty when len < n);
    n < 1 errors (fnc/array.rs windows)."""
    if isinstance(n, (int, float)) and n < 1:
        raise ValueError("Incorrect arguments for function array::windows():"
                         " window size must be a positive integer")
    a = _c(arr)
    cnt = F.size(a) - (n - 1)
    idx = F.when(cnt > 0, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.slice(a, i, n))


def transpose(arr) -> Column:
    """array::transpose — rows↔columns; ragged rows pad with NONE to the
    tallest column (val/array.rs:178-203 pads with Value::None)."""
    a = _c(arr)
    width = F.array_max(F.transform(a, F.size))
    return F.when(F.size(a) == 0, a).otherwise(F.transform(
        F.sequence(F.lit(1), width),
        lambda j: F.transform(a, lambda row: F.get(row, j - 1)),
    ))
