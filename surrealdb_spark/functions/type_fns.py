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
    secs = unit(r"(\d+)s(?![a-zµ])")
    ms = unit(r"(\d+)ms")
    us = unit(r"(\d+)(?:us|µs)")
    ns = unit(r"(\d+)ns")
    # y = 365 d of seconds — std Duration has no calendar months
    # (val/duration.rs SECONDS_PER_YEAR)
    nanos = (
        (((years * 365 + weeks * 7 + days) * 24 + hours) * 3600 + mins * 60 + secs)
        * 1_000_000_000
        + ms * 1_000_000
        + us * 1_000
        + ns
    )
    return _duration_struct(F.lit(0), nanos)


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


def bytes_(x) -> Column:
    """type::bytes — binary cast (strings encode UTF-8, fnc/type.rs)."""
    return _c(x).cast("binary")


def uuid(x) -> Column:
    """type::uuid — validate a UUID string (NULL when malformed)."""
    c = _c(x).cast("string")
    return F.when(is_uuid_str(c), F.lower(c))


def set_(x) -> Column:
    """type::set — coerce to a sorted distinct array (fnc/type.rs set; sets
    are BTreeSet-ordered, val/set.rs)."""
    return F.array_sort(F.array_distinct(_c(x)))


def string_lossy(x) -> Column:
    """type::string_lossy — like type::string, lossy on invalid UTF-8
    (Spark strings are already valid UTF-8, so identical here)."""
    return _c(x).cast("string")


def point(lon, lat=None) -> Column:
    """type::point — geometry point struct{lon,lat} (geometry.rs Point)."""
    from surrealdb_spark.functions import geo_fns as G

    if lat is None:
        # single-argument form: [lon, lat] array
        arr = _c(lon)
        return G.point(arr.getItem(0).cast("double"), arr.getItem(1).cast("double"))
    return G.point(_c(lon).cast("double"), _c(lat).cast("double"))


def geometry(x) -> Column:
    """type::geometry — accept an already-shaped geometry struct."""
    return _c(x)


def file_(x, key=None) -> Column:
    """type::file — parse 'bucket:/key' → struct{bucket,key}; the 2-arg
    form takes bucket and key directly (types/src/value/file.rs,
    fnc/type.rs file)."""
    if key is not None:
        return F.struct(_c(x).cast("string").alias("bucket"),
                        _c(key).cast("string").alias("key"))
    s = _c(x).cast("string")
    return F.struct(
        F.regexp_extract(s, r"^([^:]+):", 1).alias("bucket"),
        F.regexp_extract(s, r"^[^:]+:(.*)$", 1).alias("key"),
    )


def record(x, tb=None) -> Column:
    """type::record — validate a record id string, optionally against a
    table name (NULL when malformed / wrong table)."""
    c = _c(x).cast("string")
    ok = is_record(c)
    if tb is not None:
        ok = ok & c.startswith(F.concat(_c(tb).cast("string"), F.lit(":")))
    return F.when(ok, c)


# -- predicates (type::is_*) -------------------------------------------------
# On a typed engine these are compile-time facts: the SurrealQL compiler
# dispatches on the statically inferred category (compiler._infer) and only
# falls back to these runtime string heuristics when the type is unknown.
# Dynamic (variant) values carry a tag in values.py.


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


# Category each type::is_* predicate tests, for the compiler's static
# dispatch (compile-time truth on typed columns). Geometry sub-kinds beyond
# point are not representable in this engine → statically false.
IS_KIND_CATS: dict[str, tuple[str, ...]] = {
    "is_array": ("array",), "is_bool": ("bool",), "is_bytes": ("bytes",),
    "is_collection": (), "is_datetime": ("datetime",),
    "is_decimal": ("decimal",), "is_duration": ("object",),
    "is_float": ("float",), "is_geometry": ("object",), "is_int": ("int",),
    "is_line": (), "is_multiline": (), "is_multipoint": (),
    "is_multipolygon": (), "is_number": ("int", "float", "decimal"),
    "is_object": ("object",), "is_point": ("object",), "is_polygon": (),
    "is_range": ("object",), "is_record": ("string",), "is_set": (),
    "is_string": ("string",), "is_uuid": ("string",),
}

# Runtime fallbacks for unknown static types (string heuristics where a
# sensible one exists; otherwise conservatively false).
_RUNTIME_IS = {
    "is_int": is_int_str,
    "is_number": is_number_str,
    "is_datetime": is_datetime_str,
    "is_uuid": is_uuid_str,
    "is_record": is_record,
    "is_none": lambda x: _c(x).isNull(),
    "is_null": lambda x: _c(x).isNull(),
}


# Spark typeof() families for type::is_* when the AST kind isn't statically
# inferable (closure params, dynamic columns): the SQL typeof() builtin
# resolves to the column's analyzed type, so the check folds to a constant.
_TYPEOF_FAMILY = {
    "is_int": ("tinyint", "smallint", "int", "bigint"),
    "is_float": ("float", "double"),
    "is_bool": ("boolean",),
    "is_bytes": ("binary",),
    "is_datetime": ("timestamp", "timestamp_ntz", "date"),
}
_TYPEOF_PREFIX = {
    "is_decimal": "decimal", "is_array": "array", "is_set": "array",
    "is_object": "struct",
}


def is_kind(kind: str):
    """Registry builder for type::is_* — typeof()-based family check with
    string-shape heuristics for record/uuid/number-in-string refinement."""

    def fn(x) -> Column:
        c = x if isinstance(x, Column) else F.col(x)
        if kind == "is_set":
            return F.lit(False)  # sets are tracked statically
        if kind in ("is_none", "is_null", "is_uuid", "is_record"):
            return _RUNTIME_IS[kind](x)
        t = F.call_function("typeof", c)
        if kind == "is_string":
            res = t == "string"
        elif kind == "is_number":
            res = (t.isin("tinyint", "smallint", "int", "bigint",
                          "float", "double")
                   | t.startswith("decimal"))
        elif kind in _TYPEOF_FAMILY:
            fam = _TYPEOF_FAMILY[kind]
            res = t.isin(*fam) if len(fam) > 1 else t == fam[0]
        elif kind == "is_duration":
            res = t.startswith("struct") & t.contains("months") \
                & t.contains("nanos")
        elif kind in _TYPEOF_PREFIX:
            res = t.startswith(_TYPEOF_PREFIX[kind])
            if kind == "is_object":
                res = res & ~(t.contains("months") & t.contains("nanos"))
        else:
            return F.lit(False)
        # NONE/NULL values match no kind
        return F.coalesce((c.isNotNull() & res).cast("boolean"),
                          F.lit(False))

    return fn


# SurrealQL type-name for each static category (type::of / Value::kindof).
OF_NAMES = {
    "int": "int", "float": "float", "decimal": "decimal", "bool": "bool",
    "string": "string", "array": "array", "object": "object",
    "datetime": "datetime", "bytes": "bytes", "duration": "duration",
}


def type_of(x) -> Column:
    """type::of runtime fallback (static types resolve in the compiler)."""
    return F.lit(None).cast("string")
