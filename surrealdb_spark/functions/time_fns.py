"""time:: namespace (38 functions) — core/src/fnc/time.rs.

Extractors, bucketing (time::floor/ceil/round/group), arithmetic, and
from_* constructors over TimestampType (µs; ns documented in values.py).
All native expressions; session timezone is pinned UTC (session.py).
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


# -- extractors --------------------------------------------------------------


def second(t) -> Column:
    return F.second(_c(t))


def minute(t) -> Column:
    return F.minute(_c(t))


def hour(t) -> Column:
    return F.hour(_c(t))


def day(t) -> Column:
    return F.dayofmonth(_c(t))


def wday(t) -> Column:
    """ISO weekday 1=Mon..7=Sun (reference uses ISO numbering)."""
    return F.weekday(_c(t)) + 1


def week(t) -> Column:
    return F.weekofyear(_c(t))


def yday(t) -> Column:
    return F.dayofyear(_c(t))


def month(t) -> Column:
    return F.month(_c(t))


def year(t) -> Column:
    return F.year(_c(t))


def unix(t) -> Column:
    return F.unix_timestamp(_c(t))


def millis(t) -> Column:
    return F.unix_millis(_c(t))


def micros(t) -> Column:
    return F.unix_micros(_c(t))


def nanos(t) -> Column:
    """µs-precision engine: nanos = micros·1000 (documented truncation)."""
    return F.unix_micros(_c(t)) * 1000


def timezone() -> Column:
    return F.current_timezone()


def now() -> Column:
    return F.current_timestamp()


def is_leap_year(t) -> Column:
    y = F.year(_c(t))
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


# -- formatting / bucketing --------------------------------------------------


def format_(t, fmt: str) -> Column:
    """time::format — strftime-style; common directives translated to Spark."""
    mapping = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%j": "DDD", "%b": "MMM", "%B": "MMMM", "%a": "EEE",
        "%A": "EEEE", "%e": "d", "%y": "yy",
    }
    out = fmt
    for k, v in mapping.items():
        out = out.replace(k, v)
    return F.date_format(_c(t), out)


_UNITS = {"year", "month", "week", "day", "hour", "minute", "second", "quarter"}


def floor(t, unit: str) -> Column:
    """time::floor / time::group — truncate to unit boundary."""
    assert unit in _UNITS, unit
    return F.date_trunc(unit, _c(t))


group = floor  # time::group is bucket-truncation (fnc/time.rs)


def ceil(t, unit: str) -> Column:
    tr = F.date_trunc(unit, _c(t))
    bumped = tr + F.expr(f"INTERVAL 1 {unit}")
    return F.when(tr == _c(t), tr).otherwise(bumped)


def round_(t, unit: str) -> Column:
    lo = F.date_trunc(unit, _c(t))
    hi = lo + F.expr(f"INTERVAL 1 {unit}")
    below = (_c(t).cast("double") - lo.cast("double")) < (
        hi.cast("double") - _c(t).cast("double")
    )
    return F.when(below, lo).otherwise(hi)


# -- set_* field surgery -----------------------------------------------------


def set_field(t, field: str, v) -> Column:
    """time::set_{year,month,day,hour,minute,second,nanosecond}."""
    if field == "nanosecond":
        # µs-precision engine: truncate the sub-second part, add ns/1000 µs
        base = F.date_trunc("second", _c(t))
        return F.timestamp_micros(
            F.unix_micros(base) + (_c(v) / 1000).cast("long")
        )
    parts = {
        "year": F.year(_c(t)),
        "month": F.month(_c(t)),
        "day": F.dayofmonth(_c(t)),
        "hour": F.hour(_c(t)),
        "minute": F.minute(_c(t)),
        "second": F.second(_c(t)),
    }
    assert field in parts, field
    parts[field] = _c(v)
    # keep the µs fraction — F.second() truncates it
    # (primitive/datetimes/datetime_set_functions.surql)
    frac = F.unix_micros(_c(t)) % 1_000_000
    secs = (parts["second"].cast("decimal(16,6)")
            + frac.cast("decimal(16,6)") / 1_000_000)
    return F.make_timestamp(
        parts["year"], parts["month"], parts["day"],
        parts["hour"], parts["minute"], secs,
    )


# -- constructors ------------------------------------------------------------


def from_unix(secs) -> Column:
    return F.timestamp_seconds(_c(secs))


from_secs = from_unix


def from_millis(ms) -> Column:
    return F.timestamp_millis(_c(ms))


def from_micros(us) -> Column:
    return F.timestamp_micros(_c(us))


def from_nanos(ns) -> Column:
    return F.timestamp_micros((_c(ns) / 1000).cast("long"))


def from_ulid(u) -> Column:
    """ULID's first 10 chars encode ms since epoch (Crockford base32)."""
    alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
    c = F.upper(F.substring(_c(u), 1, 10))
    ms = F.lit(0).cast("bigint")
    for i in range(10):
        digit = F.instr(F.lit(alphabet), F.substring(c, i + 1, 1)) - 1
        ms = ms * 32 + digit
    return F.timestamp_millis(ms)


def from_uuid(u) -> Column:
    """UUIDv7: first 12 hex digits are ms since epoch."""
    hex12 = F.regexp_replace(F.substring(_c(u), 1, 13), "-", "")
    return F.timestamp_millis(F.conv(hex12, 16, 10).cast("bigint"))


# time::min / time::max aggregate over arrays of datetimes
def min_(arr) -> Column:
    return F.array_min(_c(arr))


def max_(arr) -> Column:
    return F.array_max(_c(arr))
