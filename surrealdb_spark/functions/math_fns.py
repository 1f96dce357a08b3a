"""math:: namespace (38 functions) — core/src/fnc/math.rs.

Scalar functions are native Column math; the stats family (mean/median/
mode/percentile/...) operates on ARRAY values in the reference (math::mean
([1,2,3])) and doubles as aggregate names in SELECT — both forms exist
here: array versions (this module) and aggregate mappings in
functions/aggregates.py.

math::median / percentile are EXACT (sort-based), matching the reference,
not percentile_approx.
"""

from __future__ import annotations

import math as _m

from pyspark.sql import Column
from pyspark.sql import functions as F

CONSTANTS = {
    "PI": _m.pi,
    "E": _m.e,
    "TAU": _m.tau,
    "SQRT_2": _m.sqrt(2),
    "LN_2": _m.log(2),
    "LN_10": _m.log(10),
    "LOG2_E": 1 / _m.log(2),
    "LOG10_E": 1 / _m.log(10),
    "FRAC_PI_2": _m.pi / 2,
    "FRAC_PI_4": _m.pi / 4,
    "INF": _m.inf,
    "NEG_INF": -_m.inf,
}


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


# -- scalar ------------------------------------------------------------------


def abs_(x) -> Column:
    return F.abs(_c(x))


def ceil(x) -> Column:
    return F.ceil(_c(x))


def floor(x) -> Column:
    return F.floor(_c(x))


def round_(x, digits: int = 0) -> Column:
    return F.round(_c(x), digits)


def fixed(x, digits: int) -> Column:
    """math::fixed — round to N decimal places (Number::fixed formats via
    Rust's `{v:.p$}` = round-half-even-ish float formatting; F.round is the
    closest Spark builtin).  digits must be positive (the reference errors
    on digits <= 0, fnc/math.rs)."""
    if digits <= 0:
        raise ValueError(f"math::fixed requires digits > 0, got {digits}")
    return F.round(_c(x), digits)


def sign(x) -> Column:
    return F.signum(_c(x))


def sqrt(x) -> Column:
    return F.sqrt(_c(x))


def pow_(x, p) -> Column:
    return F.pow(_c(x), _c(p))


def ln(x) -> Column:
    return F.log(_c(x))


def log(x, base) -> Column:
    return F.log(base, _c(x)) if isinstance(base, (int, float)) else F.log(_c(x)) / F.log(_c(base))


def log2(x) -> Column:
    return F.log2(_c(x))


def log10(x) -> Column:
    return F.log10(_c(x))


def exp(x) -> Column:
    return F.exp(_c(x))


def clamp(x, lo, hi) -> Column:
    return F.least(F.greatest(_c(x), _c(lo)), _c(hi))


def lerp(a, b, t) -> Column:
    """math::lerp — a + t·(b−a)."""
    return _c(a) + _c(t) * (_c(b) - _c(a))


def lerpangle(a, b, t) -> Column:
    """math::lerpangle — shortest-path angular interpolation (degrees)."""
    a, b, t = _c(a), _c(b), _c(t)
    diff = ((b - a) % 360 + 540) % 360 - 180
    return a + diff * t


def deg2rad(x) -> Column:
    return F.radians(_c(x))


def rad2deg(x) -> Column:
    return F.degrees(_c(x))


# trig
def sin(x) -> Column:
    return F.sin(_c(x))


def cos(x) -> Column:
    return F.cos(_c(x))


def tan(x) -> Column:
    return F.tan(_c(x))


def asin(x) -> Column:
    return F.asin(_c(x))


def acos(x) -> Column:
    return F.acos(_c(x))


def atan(x) -> Column:
    return F.atan(_c(x))


def cot(x) -> Column:
    return F.lit(1.0) / F.tan(_c(x))


def sinh(x) -> Column:
    return F.sinh(_c(x))


def cosh(x) -> Column:
    return F.cosh(_c(x))


def tanh(x) -> Column:
    return F.tanh(_c(x))


# -- stats over array values -------------------------------------------------


def _dsum(arr) -> Column:
    return F.aggregate(_c(arr), F.lit(0.0), lambda a, x: a + x.cast("double"))


def sum_(arr) -> Column:
    return _dsum(arr)


def product(arr) -> Column:
    return F.aggregate(_c(arr), F.lit(1.0), lambda a, x: a * x.cast("double"))


def mean(arr) -> Column:
    return _dsum(arr) / F.size(_c(arr))


def max_(arr) -> Column:
    return F.array_max(_c(arr))


def min_(arr) -> Column:
    return F.array_min(_c(arr))


def spread(arr) -> Column:
    """max − min."""
    return F.array_max(_c(arr)).cast("double") - F.array_min(_c(arr)).cast("double")


def variance(arr) -> Column:
    """Sample variance (n−1), exact-order fold."""
    a = _c(arr)
    n = F.size(a).cast("double")
    s1 = _dsum(a)
    s2 = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return (s2 - s1 * s1 / n) / (n - F.lit(1.0))


def stddev(arr) -> Column:
    return F.sqrt(variance(arr))


def percentile(arr, p: float) -> Column:
    """Exact linear-interpolated percentile over an array (p in [0,100])."""
    a = F.array_sort(F.transform(_c(arr), lambda x: x.cast("double")))
    n = F.size(a)
    pos = (n.cast("double") - 1) * F.lit(p / 100.0)
    lo = F.floor(pos).cast("int")
    frac = pos - lo.cast("double")
    lo_v = F.element_at(a, lo + 1)
    hi_v = F.element_at(a, F.least(lo + 2, n))
    return lo_v + (hi_v - lo_v) * frac


def median(arr) -> Column:
    return percentile(arr, 50.0)


def interquartile(arr) -> Column:
    return percentile(arr, 75.0) - percentile(arr, 25.0)


def midhinge(arr) -> Column:
    return (percentile(arr, 75.0) + percentile(arr, 25.0)) / 2


def trimean(arr) -> Column:
    return (percentile(arr, 25.0) + 2 * percentile(arr, 50.0) + percentile(arr, 75.0)) / 4


def nearestrank(arr, p: float) -> Column:
    """Nearest-rank percentile (ceil(p/100·n)-th smallest)."""
    a = F.array_sort(F.transform(_c(arr), lambda x: x.cast("double")))
    n = F.size(a)
    rank = F.greatest(F.ceil(n.cast("double") * F.lit(p / 100.0)).cast("int"), F.lit(1))
    return F.element_at(a, rank)


def mode(arr) -> Column:
    """Most frequent value (ties → largest, matching reference BTree order)."""
    a = _c(arr)
    counts = F.transform(
        F.array_distinct(a),
        lambda v: F.struct(
            F.size(F.filter(a, lambda x: x == v)).alias("n"), v.alias("v")
        ),
    )
    return F.element_at(F.array_sort(counts), -1).getField("v")


def top(arr, k: int) -> Column:
    """k largest values, descending."""
    return F.reverse(F.slice(F.array_sort(_c(arr)), -k, k))


def bottom(arr, k: int) -> Column:
    """k smallest values, ascending."""
    return F.slice(F.array_sort(_c(arr)), 1, k)
