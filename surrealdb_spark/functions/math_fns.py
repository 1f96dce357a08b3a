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
    # full constant set (reference: core/src/expr/constant.rs:7-34);
    # looked up case-insensitively (the language writes math::inf).
    "PI": _m.pi,
    "E": _m.e,
    "TAU": _m.tau,
    "SQRT_2": _m.sqrt(2),
    "LN_2": _m.log(2),
    "LN_10": _m.log(10),
    "LOG2_E": 1 / _m.log(2),
    "LOG10_E": 1 / _m.log(10),
    "LOG2_10": _m.log2(10),
    "LOG10_2": _m.log10(2),
    "FRAC_1_PI": 1 / _m.pi,
    "FRAC_1_SQRT_2": 1 / _m.sqrt(2),
    "FRAC_2_PI": 2 / _m.pi,
    "FRAC_2_SQRT_PI": 2 / _m.sqrt(_m.pi),
    "FRAC_PI_2": _m.pi / 2,
    "FRAC_PI_3": _m.pi / 3,
    "FRAC_PI_4": _m.pi / 4,
    "FRAC_PI_6": _m.pi / 6,
    "FRAC_PI_8": _m.pi / 8,
    "INF": _m.inf,
    "NEG_INF": -_m.inf,
    # long-form aliases (constant.rs MathInfinity/MathNegInfinity)
    "INFINITY": _m.inf,
    "NEG_INFINITY": -_m.inf,
}


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def _nanfix(res: Column, x) -> Column:
    """Rust float math yields NaN where Spark yields NULL (ln(-1), sqrt(-1),
    asin(2), ...): non-null input with null result → NaN."""
    return F.when(_c(x).isNotNull(), F.coalesce(res, F.lit(float("nan"))))


def _logfix(res: Column, x) -> Column:
    """Rust f64 log of 0 is -inf (Spark: NULL), of negatives NaN."""
    return F.when(_c(x).cast("double") == 0.0, F.lit(float("-inf"))) \
        .otherwise(_nanfix(res, x))



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
    return _nanfix(F.sqrt(_c(x)), x)


def pow_(x, p) -> Column:
    if isinstance(x, int) and isinstance(p, int) and not isinstance(
            x, bool) and p >= 0 and abs(x) > 1 and abs(x ** p) >= 2 ** 63:
        # Int ** Int overflow errors in the reference (number.rs try_pow)
        raise ValueError("Cannot raise the value " + str(x) + " with " +
                         str(p) + ": integer overflow")
    return F.pow(_c(x), _c(p))


def ln(x) -> Column:
    return _logfix(F.log(_c(x)), x)


def log(x, base) -> Column:
    if isinstance(base, (int, float)):
        return _logfix(F.log(float(base), _c(x).cast("double")), x)
    return _logfix(F.log(_c(x)) / F.log(_c(base)), x)


def log2(x) -> Column:
    return _logfix(F.log2(_c(x)), x)


def log10(x) -> Column:
    return _logfix(F.log10(_c(x)), x)


def exp(x) -> Column:
    return F.exp(_c(x))


def clamp(x, lo, hi) -> Column:
    if isinstance(lo, (int, float)) and isinstance(hi, (int, float)) \
            and lo > hi:
        raise ValueError("Incorrect arguments for function math::clamp(): "
                         "min must not exceed max")
    return F.least(F.greatest(_c(x), _c(lo)), _c(hi))


def lerp(a, b, t) -> Column:
    """math::lerp — a + t·(b−a)."""
    return _c(a) + _c(t) * (_c(b) - _c(a))


def lerpangle(a, b, t) -> Column:
    """math::lerpangle — angular interpolation matching the reference's
    repeat+flip formula (val/number.rs:531-553): dt in [0,360); when
    dt > 180 interpolate toward from+(360-dt) (the reference keeps the
    positive direction)."""
    a, b, t = _c(a), _c(b), _c(t)
    dt0 = ((b - a) % 360 + 360) % 360
    dt = F.when(dt0 > 180, F.lit(360) - dt0).otherwise(dt0)
    return a + dt * t


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
    return _nanfix(F.asin(_c(x)), x)


def acos(x) -> Column:
    return _nanfix(F.acos(_c(x)), x)


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


_NAN = float("nan")


def mean(arr) -> Column:
    # mean([]) is NaN, not a division error (fnc/util/math/mean.rs)
    a = _c(arr)
    return F.when(F.size(a) > 0, _dsum(a) / F.size(a)).otherwise(F.lit(_NAN))


def max_(arr) -> Column:
    return F.array_max(_c(arr))


def min_(arr) -> Column:
    return F.array_min(_c(arr))


def spread(arr) -> Column:
    """max − min (empty → NaN, fnc/util/math/spread.rs)."""
    return F.coalesce(
        F.array_max(_c(arr)).cast("double") - F.array_min(_c(arr)).cast("double"),
        F.lit(_NAN),
    )


def variance(arr) -> Column:
    """Sample variance (n−1), exact-order fold."""
    a = _c(arr)
    n = F.size(a).cast("double")
    s1 = _dsum(a)
    s2 = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    # n < 2 → NaN (reference variance.rs; also avoids ANSI div-by-zero)
    return F.when(n > 1, (s2 - s1 * s1 / n) / (n - F.lit(1.0))).otherwise(F.lit(_NAN))


def stddev(arr) -> Column:
    return F.sqrt(variance(arr))


def percentile(arr, p: float) -> Column:
    """Exact linear-interpolated percentile over an array (p in [0,100];
    outside that range → NaN, fnc/util/math/percentile.rs)."""
    if isinstance(p, (int, float)) and not 0 <= p <= 100:
        return F.lit(_NAN)
    a = F.array_sort(F.transform(_c(arr), lambda x: x.cast("double")))
    n = F.size(a)
    pos = (n.cast("double") - 1) * F.lit(p / 100.0)
    lo = F.floor(pos).cast("int")
    frac = pos - lo.cast("double")
    lo_v = F.try_element_at(a, lo + 1)
    hi_v = F.try_element_at(a, F.least(lo + 2, n))
    # empty → NaN (percentile.rs); try_element_at keeps ANSI mode happy
    return F.when(n > 0, lo_v + (hi_v - lo_v) * frac).otherwise(F.lit(_NAN))


def median(arr) -> Column:
    # median([]) is NONE, unlike percentile([]) which is NaN (median.rs)
    return F.when(F.size(_c(arr)) > 0, percentile(arr, 50.0))


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
    return F.when(n > 0, F.try_element_at(a, rank)).otherwise(F.lit(_NAN))


def mode(arr) -> Column:
    """Most frequent value (ties → largest, matching reference BTree order)."""
    a = _c(arr)
    counts = F.transform(
        F.array_distinct(a),
        lambda v: F.struct(
            F.size(F.filter(a, lambda x: x == v)).alias("n"), v.alias("v")
        ),
    )
    return F.when(F.size(a) > 0, F.try_element_at(
        F.array_sort(counts), F.lit(-1)).getField("v")) \
        .otherwise(F.lit(_NAN))  # mode([]) is NaN (fnc/util/math/mode.rs)


def top(arr, k: int) -> Column:
    if isinstance(k, (int, float)) and k <= 0:
        raise ValueError(
            "Incorrect arguments for function math::top(). The second "
            "argument must be an integer greater than 0.")
    """k largest values, ascending (reference top.rs returns arbitrary heap
    order; we canonicalize ascending). k > n → the whole array."""
    a = F.array_sort(_c(arr))
    n = F.size(a)
    kk = F.least(F.lit(k).cast("int"), n)
    return F.slice(a, F.greatest(n - kk + 1, F.lit(1)), kk)


def bottom(arr, k: int) -> Column:
    if isinstance(k, (int, float)) and k <= 0:
        raise ValueError(
            "Incorrect arguments for function math::bottom(). The second "
            "argument must be an integer greater than 0.")
    """k smallest values, ascending (bottom.rs, canonicalized)."""
    a = F.array_sort(_c(arr))
    return F.slice(a, 1, F.least(F.lit(k).cast("int"), F.size(a)))
