"""type:: namespace (47 functions) — casts + is_* predicates
(core/src/fnc/type.rs; Kind coercion rules types/src/kind/mod.rs:17-80).

Casts are Spark casts with SurrealQL's parsing behavior (strings parse to
numbers/datetimes/durations; failures → NULL rather than error, Spark
convention).  type::field/fields (dynamic projection) resolve at compile
time in our engine, matching the reference's plan-time resolution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from surrealdb_spark.values import duration as _duration_struct


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


# -- constructors / casts ----------------------------------------------------


def bool_(x) -> Column:
    return _c(x).cast("boolean")


def int_(x) -> Column:
    return _c(x).cast("bigint")


def float_(x) -> Column:
    return _c(x).cast("double")


def decimal(x) -> Column:
    return _c(x).cast("decimal(38,10)")


def number(x) -> Column:
    """type::number — numeric: int when exact, else float (variant-free
    engine keeps double)."""
    return _c(x).cast("double")


def string(x) -> Column:
    return _c(x).cast("string")


def datetime(x) -> Column:
    return _c(x).cast("timestamp")


def duration(x) -> Column:
    """Parse '1w2d3h4m5s6ms' duration strings → struct{months,nanos}."""
    s = _c(x).cast("string")

    def unit(pat: str) -> Column:
        return F.coalesce(F.regexp_extract(s, pat, 1).try_cast("bigint"), F.lit(0))

    years = unit(r"(\d+)y")
    weeks = unit(r"(\d+)w")
    days = unit(r"(\d+)d")
    hours = unit(r"(\d+)h")
    mins = unit(r"(\d+)m(?!s)")
    secs = unit(r"(\d+)s")
    ms = unit(r"(\d+)ms")
    nanos = (
        ((weeks * 7 + days) * 24 + hours) * 3600 + mins * 60 + secs
    ) * 1_000_000_000 + ms * 1_000_000
    return _duration_struct(years * 12, nanos)


def array(x) -> Column:
    """type::array — wrap non-arrays."""
    return F.array(_c(x))


def table(x) -> Column:
    return _c(x).cast("string")


def thing(tb, key) -> Column:
    """type::thing — build a record id."""
    return F.concat(_c(tb).cast("string"), F.lit(":"), _c(key).cast("string"))


def range_(start, end) -> Column:
    from surrealdb_spark.expr.operators import range_struct

    return range_struct(_c(start), _c(end))


# -- predicates (type::is::*) ------------------------------------------------
# On a typed engine these are compile-time facts; the dynamic (variant)
# versions live in values.py via the tag.


def is_number_str(x) -> Column:
    return _c(x).cast("string").rlike(r"^[+-]?(\d+(\.\d+)?|\.\d+)([eE][+-]?\d+)?$")


def is_int_str(x) -> Column:
    return _c(x).cast("string").rlike(r"^[+-]?\d+$")


def is_datetime_str(x) -> Column:
    return _c(x).try_cast("timestamp").isNotNull()


def is_uuid_str(x) -> Column:
    return _c(x).rlike(
        r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
    )


def is_record(x) -> Column:
    return _c(x).rlike(r"^[A-Za-z0-9_]+:.+$")
