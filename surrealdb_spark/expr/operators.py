"""SurrealQL binary/unary operators as Column combinators.

Reference: core/src/expr/operator.rs:46-127 (operator enum) and
core/src/fnc/operate.rs (evaluation dispatch); numeric promotion rules in
core/src/val/number.rs:818-846 —
  Int⊕Int → Int (checked; division TRUNCATES),
  Float⊕Float / Int⊕Float → Float,
  anything with Decimal → Decimal.

Spark notes: `/` on integers natively yields double, so surql_div
dispatches on operand types; containment maps to array_* builtins
(JVM-side); `??` maps to coalesce (typed columns collapse None/Null into
SQL NULL — values.py carries the distinction for dynamic values).
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


# -- arithmetic with reference promotion ------------------------------------


def div(a, b, integer_operands: bool = False) -> Column:
    """`/`: Int/Int truncates toward zero (Rust i64 div, number.rs:823-825);
    any float operand → float division.

    Callers pass integer_operands=True when both sides are integral (bare
    Columns don't expose their type).  Toward-zero truncation is the double
    →long cast; exact for |quotient| < 2^53 (documented caveat).  Division
    by zero: the reference errors on Int and NaN-wraps on Float
    (operate.rs:31-33); we yield NULL / ±Inf respectively (documented
    divergence, Spark semantics).
    """
    a, b = _c(a), _c(b)
    if integer_operands:
        return (a.cast("double") / b).cast("long")
    return a / b


# -- comparison / fuzzy equality --------------------------------------------


def exact_eq(a, b) -> Column:
    """`==` exact equality (operate.rs:43 `exact`)."""
    return _c(a).eqNullSafe(_c(b))


def all_eq(arr, v) -> Column:
    """`*=` — every element equals v (operator.rs AllEqual)."""
    return F.forall(_c(arr), lambda x: x == _c(v))


def any_eq(arr, v) -> Column:
    """`?=` — some element equals v (operator.rs AnyEqual)."""
    return F.exists(_c(arr), lambda x: x == _c(v))


# -- containment family (operator.rs:72-106) --------------------------------


def contains(arr, v) -> Column:
    """`CONTAINS` / `∋`."""
    return F.array_contains(_c(arr), _c(v))


def contains_not(arr, v) -> Column:
    return ~contains(arr, v)


def contains_all(arr, vals) -> Column:
    """`CONTAINSALL` — arr ⊇ vals."""
    return F.forall(_c(vals), lambda x: F.array_contains(_c(arr), x))


def contains_any(arr, vals) -> Column:
    """`CONTAINSANY` — arr ∩ vals ≠ ∅."""
    return F.arrays_overlap(_c(arr), _c(vals))


def contains_none(arr, vals) -> Column:
    return ~contains_any(arr, vals)


def inside(v, arr) -> Column:
    """`IN` / `∈` — v is an element of arr."""
    return F.array_contains(_c(arr), _c(v))


def not_inside(v, arr) -> Column:
    return ~inside(v, arr)


def all_inside(vals, arr) -> Column:
    """`ALLINSIDE` — vals ⊆ arr."""
    return F.forall(_c(vals), lambda x: F.array_contains(_c(arr), x))


def any_inside(vals, arr) -> Column:
    return F.arrays_overlap(_c(vals), _c(arr))


def none_inside(vals, arr) -> Column:
    return ~any_inside(vals, arr)


# -- logic / coalescing (operator.rs:60-66) ---------------------------------


def nco(a, b) -> Column:
    """`??` — null coalescing (None or Null → rhs)."""
    return F.coalesce(_c(a), _c(b))


def tco(a, b, truthy: Column | None = None) -> Column:
    """`?:` — truthy-else: a if a is truthy else b.

    For typed columns pass ``truthy`` explicitly when truthiness isn't
    plain non-null (e.g. numbers: !=0, strings: !='').
    """
    a = _c(a)
    cond = truthy if truthy is not None else a.isNotNull()
    return F.when(cond, a).otherwise(_c(b))


def truthy_number(c) -> Column:
    return _c(c).isNotNull() & (_c(c) != 0)


def truthy_string(c) -> Column:
    return _c(c).isNotNull() & (F.length(_c(c)) > 0)


def truthy_array(c) -> Column:
    return _c(c).isNotNull() & (F.size(_c(c)) > 0)


# -- full-text match (operator.rs Matches `@@`) -----------------------------


def matches(text, query, any_mode: bool = False) -> Column:
    """`@@` — every analyzed query term occurs in the document's tokens
    (FullTextScan conjunction semantics, idx/ft/fulltext.rs QueryTerms:
    all terms must have postings; BM25 scoring lives in
    operators/fulltext.py — the predicate form is index-free and JVM-side).
    ``any_mode`` = `@OR@` boolean mode: ANY term matching suffices
    (operator.rs MatchesOperator::Or).
    Tokenization mirrors pipeline/text.py: lowercase, split on non-alnum.
    """
    # array_remove(x, '') on both sides: splitting "hello." / "foo." yields a
    # trailing '' token, and ''-overlap would make any punctuated pair match.
    toks = F.array_remove(F.split(F.lower(_c(text)), r"[^a-z0-9]+"), "")
    qtoks = F.array_remove(F.split(F.lower(_c(query)), r"[^a-z0-9]+"), "")
    if any_mode:
        return F.exists(qtoks, lambda q: F.array_contains(toks, q))
    return (F.size(qtoks) > 0) & F.forall(
        qtoks, lambda q: F.array_contains(toks, q))


# -- ranges (operator.rs:108-112: .. ..= >.. >..=) --------------------------


def range_struct(start, end, start_incl: bool = True, end_incl: bool = False) -> Column:
    """Range value: struct{start, end, start_incl, end_incl} (SURVEY §1.4)."""
    return F.struct(
        _c(start).alias("start"),
        _c(end).alias("end"),
        F.lit(start_incl).alias("start_incl"),
        F.lit(end_incl).alias("end_incl"),
    )


def range_contains(rng: Column, v) -> Column:
    """v ∈ range, honoring inclusivity flags."""
    v = _c(v)
    lo = F.when(rng.getField("start_incl"), v >= rng.getField("start")).otherwise(
        v > rng.getField("start")
    )
    hi = F.when(rng.getField("end_incl"), v <= rng.getField("end")).otherwise(
        v < rng.getField("end")
    )
    return lo & hi
