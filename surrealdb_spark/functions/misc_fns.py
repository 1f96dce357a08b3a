"""object:: / duration:: / parse:: / crypto:: / rand:: / encoding:: /
record:: namespaces — the smaller function families
(core/src/fnc/{object,duration,parse,crypto,rand,encoding,record}.rs).
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


# -- object:: (8) over MapType or StructType ---------------------------------
# Object literals compile to STRUCTs (typed engine); user maps stay MapType.
# keys/len/is_empty go through to_json so one implementation covers both.


def obj_keys(m) -> Column:
    return F.json_object_keys(F.to_json(_c(m)))


def obj_values(m) -> Column:
    return F.map_values(_c(m))


def obj_len(m) -> Column:
    return F.size(obj_keys(m))


def obj_is_empty(m) -> Column:
    return F.size(obj_keys(m)) == 0


def obj_entries(m) -> Column:
    """object::entries — array of [key, value] structs."""
    return F.map_entries(_c(m))


def obj_from_entries(arr) -> Column:
    return F.map_from_entries(_c(arr))


def obj_extend(a, b) -> Column:
    """object::extend — right-biased merge."""
    return F.map_zip_with(
        _c(a), _c(b), lambda _, v1, v2: F.coalesce(v2, v1)
    )


def obj_remove(m, key) -> Column:
    return F.map_filter(_c(m), lambda k, _: k != _c(key))


# -- duration:: (17) over struct{months, nanos} ------------------------------

_NS = {"nanos": 1, "micros": 1_000, "millis": 1_000_000, "secs": 1_000_000_000,
       "mins": 60_000_000_000, "hours": 3_600_000_000_000, "days": 86_400_000_000_000,
       "weeks": 604_800_000_000_000}


def dur_unit(d, unit: str) -> Column:
    """duration::{nanos,micros,millis,secs,mins,hours,days,weeks} — whole
    units of the day-time component."""
    return (_c(d).getField("nanos") / _NS[unit]).cast("long")


_NS_YEAR = 365 * 86_400_000_000_000  # val/duration.rs SECONDS_PER_YEAR


def dur_years(d) -> Column:
    # y = 365 d of seconds (std Duration has no calendar component)
    return (_c(d).getField("nanos") / _NS_YEAR).cast("long")


def dur_months(d) -> Column:
    """Extension: calendar months ride the struct's months field (the
    reference's std-Duration has no months unit)."""
    return _c(d).getField("months")


def dur_from(unit: str, n) -> Column:
    from surrealdb_spark.values import duration as mk

    if unit == "months":
        return mk(_c(n), 0)
    if unit == "years":
        return mk(0, _c(n) * _NS_YEAR)
    return mk(0, _c(n) * _NS[unit])


# -- parse:: (9) -------------------------------------------------------------


def parse_email_user(s) -> Column:
    return F.substring_index(_c(s), "@", 1)


def parse_email_host(s) -> Column:
    return F.substring_index(_c(s), "@", -1)


def parse_url_domain(s) -> Column:
    return F.parse_url(_c(s), F.lit("HOST"))


def parse_url_path(s) -> Column:
    return F.parse_url(_c(s), F.lit("PATH"))


def parse_url_query(s) -> Column:
    return F.parse_url(_c(s), F.lit("QUERY"))


def parse_url_fragment(s) -> Column:
    return F.parse_url(_c(s), F.lit("REF"))


def parse_url_scheme(s) -> Column:
    return F.parse_url(_c(s), F.lit("PROTOCOL"))


def parse_url_port(s) -> Column:
    return F.regexp_extract(_c(s), r"^[a-z]+://[^/:]+:(\d+)", 1).try_cast("int")


# -- crypto:: (7) ------------------------------------------------------------


def crypto_md5(s) -> Column:
    return F.md5(_c(s).cast("binary"))


def crypto_sha1(s) -> Column:
    return F.sha1(_c(s).cast("binary"))


def crypto_sha256(s) -> Column:
    return F.sha2(_c(s).cast("binary"), 256)


def crypto_sha512(s) -> Column:
    return F.sha2(_c(s).cast("binary"), 512)


def crypto_joaat(s) -> Column:
    """Jenkins one-at-a-time — loop over chars via aggregate (32-bit)."""
    chars = F.split(_c(s), "")
    M = F.lit(0xFFFFFFFF).cast("bigint")

    def step(acc: Column, ch: Column) -> Column:
        h = (acc + F.ascii(ch)).bitwiseAND(M)
        h = (h + F.shiftleft(h, 10)).bitwiseAND(M)
        return h.bitwiseXOR(F.shiftright(h, 6))

    h = F.aggregate(chars, F.lit(0).cast("bigint"), step)
    h = (h + F.shiftleft(h, 3)).bitwiseAND(M)
    h = h.bitwiseXOR(F.shiftright(h, 11))
    return (h + F.shiftleft(h, 15)).bitwiseAND(M)


# bcrypt/scrypt/argon2/pbkdf2: password KDFs are out of analytics scope —
# gate behind an import-try of passlib-style libs (absent in this image).
def crypto_bcrypt_generate(_s) -> Column:
    raise NotImplementedError("bcrypt requires a KDF library not present in this image")


# -- rand:: (10) — nondeterministic by nature --------------------------------


def rand_float() -> Column:
    return F.rand()


def rand_int(lo: int, hi: int) -> Column:
    return (F.rand() * (hi - lo + 1)).cast("long") + lo


def rand_bool() -> Column:
    return F.rand() > 0.5


def rand_enum(*vals) -> Column:
    arr = F.array(*[F.lit(v) for v in vals])
    return F.element_at(arr, (F.rand() * len(vals)).cast("int") + 1)


def rand_uuid() -> Column:
    return F.uuid()


def rand_string(length: int = 10) -> Column:
    return F.substring(F.md5(F.rand().cast("string")), 1, length)


# -- encoding:: (4) ----------------------------------------------------------


def base64_encode(s) -> Column:
    """encoding::base64::encode — padless alphabet (fnc/encoding.rs uses
    STANDARD_NO_PAD)."""
    return F.regexp_replace(F.base64(_c(s).cast("binary")), "=+$", "")


def base64_decode(s) -> Column:
    """encoding::base64::decode → bytes; accepts padless input (re-padded to
    a multiple of 4 for unbase64)."""
    c = _c(s).cast("string")
    pad = ((4 - F.length(c) % 4) % 4).cast("int")
    return F.unbase64(F.concat(c, F.substring(F.lit("==="), 1, pad)))


def json_encode(x) -> Column:
    """encoding::json::encode — JSON text for any value.  Scalars are
    serialized through a one-element array (to_json needs a container) and
    the wrapping brackets stripped."""
    j = F.to_json(F.array(_c(x)))
    return j.substr(F.lit(2), F.length(j) - 2)



def json_decode(s, schema: str | None = None) -> Column:
    """encoding::json::decode — with a DDL ``schema`` it is a plain
    from_json over any column; a LITERAL json string without a schema
    decodes at compile time (the typed engine needs a static type, which a
    literal carries in itself)."""
    if schema is not None:
        return F.from_json(F.lit(s) if isinstance(s, str) else _c(s), schema)
    if not isinstance(s, str):
        raise ValueError("encoding::json::decode needs a schema for non-literal input")
    import json as _json

    return _lit_value(_json.loads(s))


def _lit_value(v) -> Column:
    """A parsed-JSON Python value → Column (dicts→structs, lists→arrays)."""
    if isinstance(v, dict):
        if not v:
            return F.struct()
        return F.struct(*[_lit_value(x).alias(k) for k, x in v.items()])
    if isinstance(v, list):
        return F.array(*[_lit_value(x) for x in v])
    if isinstance(v, bool) or v is None or isinstance(v, float):
        return F.lit(v)
    if isinstance(v, int):
        return F.lit(v).cast("bigint")
    return F.lit(v)


# -- record:: (5) ------------------------------------------------------------


def record_id_part(r) -> Column:
    return F.substring_index(_c(r), ":", -1)


def record_tb(r) -> Column:
    return F.substring_index(_c(r), ":", 1)


record_table = record_tb


def record_exists(r, target, target_id: str = "id"):
    """record::exists — semi-join against the target table (DataFrame-level
    op, returns a joined DataFrame; per-row form needs the join)."""
    raise NotImplementedError(
        "record::exists is a semi-join: df.join(target, cond, 'left_semi')"
    )


def record_is_edge(r) -> Column:
    """Edge records' keys embed in/out — our engine marks edges by table
    membership; string form can't tell, so test key shape."""
    return _c(r).rlike("^[A-Za-z0-9_]+:.+")
