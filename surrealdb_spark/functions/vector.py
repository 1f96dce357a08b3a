"""vector:: namespace — element-wise ops, norms, distances, similarities.

Reference: core/src/fnc/vector.rs:1-193 (Euclidean/Manhattan/Cosine/
Chebyshev/Hamming/Minkowski/Jaccard/Pearson + add/sub/mul/div/scale/dot/
magnitude/normalize/project/cross/angle) over arrays of numbers.

All implemented as JVM-side higher-order Column expressions over
``array<float|double>`` — no UDFs, fully codegen'd, scale-safe.

Determinism note: reductions fold LEFT-TO-RIGHT in double via
``F.aggregate`` — a fixed evaluation order, so results are bit-stable
(and reproducible against any engine that folds sequentially, e.g.
DuckDB's list_reduce).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(x: Column) -> Column:
    return x.cast("double")


# Construction-cost note (r12): building a HOF fold through the Python
# lambda API costs dozens of py4j round trips per call — measured ~0.3 s
# per cosine_distance at query-build time.  When both inputs are plain
# column NAMES, the same expression tree is built with ONE round trip via
# F.expr over an SQL string (verbatim semantics: same casts, same fold
# order, bit-identical results — oracle-verified).  Column-object inputs
# fall back to the lambda form.


import re as _re

_IDENT = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _name(col: Column | str) -> str | None:
    # simple identifiers only: a dotted string means a nested-field path
    # under F.col() semantics, which a backticked SQL name would NOT match
    if isinstance(col, str) and _IDENT.match(col):
        return f"`{col}`"
    return None


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE))"
    )


def fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum in double (deterministic order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + _d(x))


# -- element-wise arithmetic (vector::add/sub/mul/div/scale) ----------------


def add(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) + _d(y))


def sub(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) - _d(y))


def mul(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) * _d(y))


def divide(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: _d(x) / _d(y))


def scale(a: Column | str, s: Column) -> Column:
    return F.transform(_c(a), lambda x: _d(x) * _d(s))


# -- reductions --------------------------------------------------------------


def dot(a: Column | str, b: Column | str) -> Column:
    """vector::dot — Σ aᵢbᵢ, sequential double fold."""
    na, nb = _name(a), _name(b)
    if na and nb:
        return F.expr(_sql_dot(na, nb))
    return fold_sum(F.zip_with(_c(a), _c(b), lambda x, y: _d(x) * _d(y)))


def magnitude(a: Column | str) -> Column:
    """vector::magnitude — L2 norm."""
    return F.sqrt(dot(a, a))


def normalize(a: Column | str) -> Column:
    """vector::normalize — a / |a|."""
    return scale(a, F.lit(1.0) / magnitude(a))


def project(a: Column | str, b: Column | str) -> Column:
    """vector::project — (a·b / b·b) b."""
    return scale(b, dot(a, b) / dot(b, b))


def cross(a: Column | str, b: Column | str) -> Column:
    """vector::cross — 3-D cross product."""
    a, b = _c(a), _c(b)

    def at(v: Column, i: int) -> Column:
        return _d(F.element_at(v, i))

    return F.array(
        at(a, 2) * at(b, 3) - at(a, 3) * at(b, 2),
        at(a, 3) * at(b, 1) - at(a, 1) * at(b, 3),
        at(a, 1) * at(b, 2) - at(a, 2) * at(b, 1),
    )


# -- distances (vector::distance::*) ----------------------------------------


def euclidean(a: Column | str, b: Column | str) -> Column:
    na, nb = _name(a), _name(b)
    if na and nb:
        return F.expr(
            f"sqrt(aggregate(zip_with({na}, {nb}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
            f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE)))"
        )
    return F.sqrt(fold_sum(F.zip_with(_c(a), _c(b), lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y)))))


def manhattan(a: Column | str, b: Column | str) -> Column:
    na, nb = _name(a), _name(b)
    if na and nb:
        return F.expr(
            f"aggregate(zip_with({na}, {nb}, (x, y) -> "
            f"abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
        )
    return fold_sum(F.zip_with(_c(a), _c(b), lambda x, y: F.abs(_d(x) - _d(y))))


def chebyshev(a: Column | str, b: Column | str) -> Column:
    return F.array_max(F.zip_with(_c(a), _c(b), lambda x, y: F.abs(_d(x) - _d(y))))


def minkowski(a: Column | str, b: Column | str, p: float) -> Column:
    return F.pow(
        fold_sum(F.zip_with(_c(a), _c(b), lambda x, y: F.pow(F.abs(_d(x) - _d(y)), F.lit(p)))),
        F.lit(1.0 / p),
    )


def hamming(a: Column | str, b: Column | str) -> Column:
    return fold_sum(F.zip_with(_c(a), _c(b), lambda x, y: (x != y).cast("double")))


# -- similarities (vector::similarity::*) -----------------------------------


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    na, nb = _name(a), _name(b)
    if na and nb:
        return F.expr(
            f"{_sql_dot(na, nb)} / (sqrt({_sql_dot(na, na)}) * "
            f"sqrt({_sql_dot(nb, nb)}))"
        )
    return dot(a, b) / (magnitude(a) * magnitude(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    na, nb = _name(a), _name(b)
    if na and nb:
        return F.expr(
            f"CAST(1.0 AS DOUBLE) - ({_sql_dot(na, nb)} / "
            f"(sqrt({_sql_dot(na, na)}) * sqrt({_sql_dot(nb, nb)})))"
        )
    return F.lit(1.0) - cosine_similarity(a, b)


def jaccard_similarity(a: Column | str, b: Column | str) -> Column:
    """Set Jaccard over vector elements (reference treats inputs as sets)."""
    inter = F.size(F.array_intersect(_c(a), _c(b))).cast("double")
    union = F.size(F.array_union(_c(a), _c(b))).cast("double")
    return inter / union


def pearson_similarity(a: Column | str, b: Column | str) -> Column:
    """Pearson correlation of paired elements (sequential folds)."""
    a, b = _c(a), _c(b)
    n = F.size(a).cast("double")
    sa, sb = fold_sum(a), fold_sum(b)
    saa = fold_sum(F.zip_with(a, a, lambda x, y: _d(x) * _d(y)))
    sbb = fold_sum(F.zip_with(b, b, lambda x, y: _d(x) * _d(y)))
    sab = fold_sum(F.zip_with(a, b, lambda x, y: _d(x) * _d(y)))
    cov = sab / n - sa * sb / n / n
    va = saa / n - sa * sa / n / n
    vb = sbb / n - sb * sb / n / n
    return cov / F.sqrt(va * vb)


METRICS = {
    "cosine": cosine_distance,
    "euclidean": euclidean,
    "manhattan": manhattan,
    "chebyshev": chebyshev,
    "hamming": hamming,
}


# -- f32-accumulated variants (HNSW stores vectors at the index's declared
# TYPE, default F32 — catalog/schema/index.rs VectorType; idx/trees/vector.rs
# accumulates dot/norm sums at storage precision, final math in f64) -------


def _p32(a: Column | str, b: Column | str) -> Column:
    """Element products accumulated as f32 then summed as f32."""
    prods = F.zip_with(
        _c(a), _c(b),
        lambda x, y: (x.cast("float") * y.cast("float")).cast("float"))
    return F.aggregate(
        prods, F.lit(0.0).cast("float"),
        lambda acc, x: (acc + x).cast("float"))


def cosine_distance_f32(a: Column | str, b: Column | str) -> Column:
    """1 - dot32/sqrt(n1_32 * n2_32), division/sqrt in f64."""
    return F.lit(1.0) - _p32(a, b).cast("double") / F.sqrt(
        _p32(a, a).cast("double") * _p32(b, b).cast("double"))


def euclidean_f32(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b),
        lambda x, y: ((x.cast("float") - y.cast("float"))
                      * (x.cast("float") - y.cast("float"))).cast("float"))
    s = F.aggregate(diffs, F.lit(0.0).cast("float"),
                    lambda acc, x: (acc + x).cast("float"))
    return F.sqrt(s.cast("double"))


def manhattan_f32(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b),
        lambda x, y: F.abs(x.cast("float") - y.cast("float")).cast("float"))
    return F.aggregate(diffs, F.lit(0.0).cast("float"),
                       lambda acc, x: (acc + x).cast("float")).cast("double")
