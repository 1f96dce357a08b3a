"""Function dispatch registry — the analogue of the reference's synchronous
dispatch table (core/src/fnc/mod.rs:148, ~1326 match arms) and the typed
registry core/src/exec/function/registry.rs.

Maps "namespace::name" → Column-builder callable.  Used by the SurrealQL
compiler for name resolution and by INFO-style introspection; coverage
below is the implemented subset of the 419 built-ins (SURVEY §2.11).
"""

from __future__ import annotations

from collections.abc import Callable

from surrealdb_spark.functions import array as A
from surrealdb_spark.functions import geo_fns as G
from surrealdb_spark.functions import geometry as GM
from surrealdb_spark.functions import math_fns as M
from surrealdb_spark.functions import misc_fns as X
from surrealdb_spark.functions import string_fns as S
from surrealdb_spark.functions import time_fns as TM
from surrealdb_spark.functions import type_fns as TY
from surrealdb_spark.functions import vector as V

REGISTRY: dict[str, Callable] = {}


def _ns(ns: str, mapping: dict[str, Callable]) -> None:
    for name, fn in mapping.items():
        REGISTRY[f"{ns}::{name}"] = fn


_ns(
    "array",
    {
        "add": A.add, "append": A.append, "all": A.all_, "any": A.any_, "at": A.at,
        "boolean_and": A.boolean_and, "boolean_or": A.boolean_or,
        "boolean_xor": A.boolean_xor, "boolean_not": A.boolean_not,
        "clump": A.clump, "combine": A.combine, "complement": A.complement,
        "concat": A.concat, "difference": A.difference, "distinct": A.distinct,
        "every": A.every, "fill": A.fill, "filter": A.filter_,
        "filter_index": A.filter_index, "find": A.find, "find_index": A.find_index,
        "first": A.first, "flatten": A.flatten, "fold": A.fold, "group": A.group,
        "includes": A.includes, "index_of": A.index_of, "insert": A.insert,
        "intersect": A.intersect, "is_empty": A.is_empty, "join": A.join,
        "last": A.last, "len": A.len_, "logical_and": A.logical_and,
        "logical_or": A.logical_or, "logical_xor": A.logical_xor, "map": A.map_,
        "matches": A.matches, "max": A.max_, "min": A.min_, "pop": A.pop,
        "prepend": A.prepend, "push": A.push, "range": A.range_, "reduce": A.reduce,
        "remove": A.remove, "repeat": A.repeat, "reverse": A.reverse,
        "sequence": A.sequence, "shuffle": A.shuffle, "slice": A.slice_,
        "some": A.some, "sort": A.sort, "sort::asc": A.sort_asc,
        "sort::desc": A.sort_desc, "sort_lexical": A.sort_lexical,
        "sort_natural": A.sort_natural, "swap": A.swap, "transpose": A.transpose,
        "union": A.union, "windows": A.windows,
    },
)

# set:: — array ops with dedup guarantee (core/src/fnc/set.rs): same impls
# over distinct arrays.
_ns(
    "set",
    {
        "add": A.add, "all": A.all_, "any": A.any_, "complement": A.complement,
        "contains": A.includes, "difference": A.difference, "distinct": A.distinct,
        "intersect": A.intersect, "is_empty": A.is_empty, "len": A.len_,
        "union": lambda a, b: A.distinct(A.union(a, b)),
    },
)

_ns(
    "string",
    {
        "concat": S.concat, "contains": S.contains, "ends_with": S.ends_with,
        "starts_with": S.starts_with, "join": S.join, "len": S.len_,
        "lowercase": S.lowercase, "uppercase": S.uppercase,
        "capitalize": S.capitalize, "repeat": S.repeat, "replace": S.replace,
        "reverse": S.reverse, "slice": S.slice_, "slug": S.slug, "split": S.split,
        "trim": S.trim, "words": S.words, "matches": S.matches,
        "distance::levenshtein": S.levenshtein, "distance::hamming": S.hamming,
        "distance::damerau_levenshtein": S.damerau,
        "similarity::jaro": S.jaro, "similarity::jaro_winkler": S.jaro_winkler,
        "similarity::sorensen_dice": S.sorensen_dice,
        "similarity::smithwaterman": S.smithwaterman,
        "semver::major": lambda s: S.semver_part(s, "major"),
        "semver::minor": lambda s: S.semver_part(s, "minor"),
        "semver::patch": lambda s: S.semver_part(s, "patch"),
        "semver::compare": S.semver_compare,
        "html::encode": S.html_encode, "html::sanitize": S.html_sanitize,
        **{f"is::{k}": (lambda k: (lambda s: S.is_(k, s)))(k) for k in S._IS_PATTERNS},
    },
)

_ns(
    "math",
    {
        "abs": M.abs_, "ceil": M.ceil, "floor": M.floor, "round": M.round_,
        "fixed": M.fixed, "sign": M.sign, "sqrt": M.sqrt, "pow": M.pow_,
        "ln": M.ln, "log": M.log, "log2": M.log2, "log10": M.log10, "exp": M.exp,
        "clamp": M.clamp, "lerp": M.lerp, "lerpangle": M.lerpangle,
        "deg2rad": M.deg2rad, "rad2deg": M.rad2deg,
        "sin": M.sin, "cos": M.cos, "tan": M.tan, "asin": M.asin, "acos": M.acos,
        "atan": M.atan, "cot": M.cot, "sinh": M.sinh, "cosh": M.cosh, "tanh": M.tanh,
        "sum": M.sum_, "product": M.product, "mean": M.mean, "max": M.max_,
        "min": M.min_, "spread": M.spread, "variance": M.variance,
        "stddev": M.stddev, "percentile": M.percentile, "median": M.median,
        "interquartile": M.interquartile, "midhinge": M.midhinge,
        "trimean": M.trimean, "nearestrank": M.nearestrank, "mode": M.mode,
        "top": M.top, "bottom": M.bottom,
    },
)

_ns(
    "time",
    {
        "second": TM.second, "minute": TM.minute, "hour": TM.hour, "day": TM.day,
        "wday": TM.wday, "week": TM.week, "yday": TM.yday, "month": TM.month,
        "year": TM.year, "unix": TM.unix, "millis": TM.millis, "micros": TM.micros,
        "nanos": TM.nanos, "timezone": TM.timezone, "now": TM.now,
        "format": TM.format_, "floor": TM.floor, "ceil": TM.ceil,
        "round": TM.round_, "group": TM.group, "min": TM.min_, "max": TM.max_,
        "from::unix": TM.from_unix, "from::secs": TM.from_secs,
        "from::millis": TM.from_millis, "from::micros": TM.from_micros,
        "from::nanos": TM.from_nanos, "from::ulid": TM.from_ulid,
        "from::uuid": TM.from_uuid, "is::leap_year": TM.is_leap_year,
        **{f"set::{f}": (lambda f: (lambda t, v: TM.set_field(t, f, v)))(f)
           for f in ("year", "month", "day", "hour", "minute", "second")},
    },
)

# type:: — full 47-function namespace (core/src/fnc/mod.rs:471-514,645-646).
# is_* and of/field/fields get compile-time static dispatch in the SurrealQL
# compiler; the registry entries are the runtime fallbacks.
_ns(
    "type",
    {
        "array": TY.array, "bool": TY.bool_, "bytes": TY.bytes_,
        "datetime": TY.datetime, "decimal": TY.decimal,
        "duration": TY.duration, "file": TY.file_, "float": TY.float_,
        "geometry": TY.geometry, "int": TY.int_, "number": TY.number,
        "of": TY.type_of, "point": TY.point, "range": TY.range_,
        "record": TY.record, "set": TY.set_, "string": TY.string,
        "string_lossy": TY.string_lossy, "table": TY.table,
        "thing": TY.thing, "uuid": TY.uuid,
        "field": TY.type_of,   # placeholder: compiler resolves literal names
        "fields": TY.type_of,  # placeholder: compiler resolves literal names
        **{k: TY.is_kind(k) for k in TY.IS_KIND_CATS},
        "is_none": TY.is_kind("is_none"), "is_null": TY.is_kind("is_null"),
    },
)

_ns(
    "vector",
    {
        "add": V.add, "subtract": V.sub, "multiply": V.mul, "divide": V.divide,
        "scale": V.scale, "dot": V.dot, "magnitude": V.magnitude,
        "normalize": V.normalize, "project": V.project, "cross": V.cross,
        "distance::euclidean": V.euclidean, "distance::manhattan": V.manhattan,
        "distance::chebyshev": V.chebyshev, "distance::minkowski": V.minkowski,
        "distance::hamming": V.hamming,
        "similarity::cosine": V.cosine_similarity,
        "similarity::jaccard": V.jaccard_similarity,
        "similarity::pearson": V.pearson_similarity,
    },
)

_ns(
    "object",
    {
        "entries": X.obj_entries, "from_entries": X.obj_from_entries,
        "keys": X.obj_keys, "values": X.obj_values, "len": X.obj_len,
        "extend": X.obj_extend, "remove": X.obj_remove, "is_empty": X.obj_is_empty,
    },
)

_ns(
    "duration",
    {
        **{u: (lambda u: (lambda d: X.dur_unit(d, u)))(u) for u in X._NS},
        "years": X.dur_years, "months": X.dur_months,
        **{f"from::{u}": (lambda u: (lambda n: X.dur_from(u, n)))(u)
           for u in list(X._NS) + ["years", "months"]},
    },
)

_ns(
    "parse",
    {
        "email::user": X.parse_email_user, "email::host": X.parse_email_host,
        "url::domain": X.parse_url_domain, "url::host": X.parse_url_domain,
        "url::path": X.parse_url_path, "url::query": X.parse_url_query,
        "url::fragment": X.parse_url_fragment, "url::scheme": X.parse_url_scheme,
        "url::port": X.parse_url_port,
    },
)

_ns(
    "crypto",
    {
        "md5": X.crypto_md5, "sha1": X.crypto_sha1, "sha256": X.crypto_sha256,
        "sha512": X.crypto_sha512, "joaat": X.crypto_joaat,
    },
)

_ns(
    "rand",
    {
        "float": X.rand_float, "int": X.rand_int, "bool": X.rand_bool,
        "enum": X.rand_enum, "uuid": X.rand_uuid, "string": X.rand_string,
    },
)

_ns(
    "encoding",
    {
        "base64::encode": X.base64_encode, "base64::decode": X.base64_decode,
        "json::encode": X.json_encode, "json::decode": X.json_decode,
    },
)

_ns(
    "record",
    {"id": X.record_id_part, "tb": X.record_tb, "table": X.record_table},
)

_ns(
    "geo",
    {
        "distance": G.distance, "bearing": G.bearing, "centroid": G.centroid,
        "area": G.area, "is::valid": G.is_valid,
        "hash::encode": G.hash_encode, "hash::decode": G.hash_decode,
    },
)

# geometry constructors + predicates (types/src/value/geometry.rs;
# val/geometry.rs contains/intersects) — functional form of the
# INSIDE/OUTSIDE/INTERSECTS operator surface.
_ns(
    "geometry",
    {
        "point": GM.point, "line": GM.line, "polygon": GM.polygon,
        "multipoint": GM.multipoint, "multiline": GM.multiline,
        "multipolygon": GM.multipolygon, "intersects": GM.intersects,
        "outside": GM.outside, "contains": GM.contains,
        "as_point": GM.as_point,
    },
)


def lookup(name: str) -> Callable:
    return REGISTRY[name]


def coverage() -> dict[str, int]:
    """Implemented-function counts per namespace (for INFO/reporting)."""
    out: dict[str, int] = {}
    for k in REGISTRY:
        ns = k.split("::", 1)[0]
        out[ns] = out.get(ns, 0) + 1
    return out
