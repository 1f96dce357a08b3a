"""Long-tail built-ins: crypto KDFs, CBOR, session, file buckets, value
diff/patch, rand extensions, semver mutation, string distances.

Parity targets (public reference, surrealdb/surrealdb):
  crypto   core/src/fnc/crypto.rs       (pbkdf2/scrypt via hashlib; argon2/
                                         bcrypt/blake3 need absent libraries)
  encoding core/src/fnc/encoding.rs     (cbor — RFC 8949 subset, pure Python)
  session  core/src/fnc/session.rs      (session properties → SessionContext)
  file     core/src/fnc/file.rs         (bucket ops → local-filesystem bucket)
  value    core/src/fnc/value.rs        (diff/patch — JSON-Patch round trip)
  rand     core/src/fnc/rand.rs         (ulid/uuid::v7/id/time/duration)
  string   core/src/fnc/string.rs       (normalized distances, osa, fuzzy,
                                         semver::inc/set)
  vector   core/src/fnc/vector.rs       (angle; spearman is Unimplemented in
                                         the reference — implemented here as a
                                         superset; mahalanobis kept
                                         Unimplemented for parity)

UDF discipline: everything row-wise is an Arrow-batched pandas_udf; pure
column algebra stays JVM-side.
"""

from __future__ import annotations

import hashlib
import json
import math
import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# -- string distances (normalized + OSA + fuzzy) ------------------------------


def _lev(a: str, b: str, transpose: bool = False) -> int:
    """Levenshtein / OSA (restricted Damerau) distance."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la or not lb:
        return la or lb
    prev2: list[int] = []
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if transpose and i > 1 and j > 1 and ca == b[j - 2] and cb == a[j - 2]:
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


@F.pandas_udf(T.DoubleType())
def normalized_levenshtein(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        x, y = x or "", y or ""
        m = max(len(x), len(y))
        out.append(1.0 if m == 0 else 1.0 - _lev(x, y) / m)
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.DoubleType())
def normalized_damerau(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        x, y = x or "", y or ""
        m = max(len(x), len(y))
        out.append(1.0 if m == 0 else 1.0 - _lev(x, y, transpose=True) / m)
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.LongType())
def osa_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [_lev(x or "", y or "", transpose=True) for x, y in zip(a, b)],
        dtype="int64",
    )


@F.pandas_udf(T.LongType())
def fuzzy_score(a: pd.Series, b: pd.Series) -> pd.Series:
    """string::similarity::fuzzy — subsequence match score.

    The reference uses SkimMatcherV2 (fuzzy_matcher crate); this is a
    compatible-shape scorer: 0 when `b` is not a subsequence of `a`,
    otherwise per-char score with consecutive-run bonus (same monotonicity,
    not bit-identical scores).
    """

    def score(hay: str, needle: str) -> int:
        hay_l, nee_l = hay.lower(), needle.lower()
        total, run, pos = 0, 0, 0
        for ch in nee_l:
            idx = hay_l.find(ch, pos)
            if idx < 0:
                return 0
            run = run + 1 if idx == pos else 1
            total += 16 + 8 * (run - 1)
            pos = idx + 1
        return total

    return pd.Series(
        [score(x or "", y or "") for x, y in zip(a, b)], dtype="int64"
    )


# -- string::semver::inc / set ------------------------------------------------


def _semver_rebuild(s, major, minor, patch) -> Column:
    tail = F.regexp_extract(_c(s), r"^\d+\.\d+\.\d+(.*)$", 1)
    return F.concat(
        major.cast("string"), F.lit("."), minor.cast("string"), F.lit("."),
        patch.cast("string"), tail,
    )


def semver_inc(s, part: str) -> Column:
    from surrealdb_spark.functions.string_fns import semver_part

    maj, min_, pat = (semver_part(s, p) for p in ("major", "minor", "patch"))
    if part == "major":
        maj, min_, pat = maj + 1, F.lit(0), F.lit(0)
    elif part == "minor":
        min_, pat = min_ + 1, F.lit(0)
    else:
        pat = pat + 1
    return _semver_rebuild(s, maj, min_, pat)


def semver_set(s, part: str, v) -> Column:
    from surrealdb_spark.functions.string_fns import semver_part

    parts = {p: semver_part(s, p) for p in ("major", "minor", "patch")}
    parts[part] = _c(v) if isinstance(v, Column) else F.lit(v)
    return _semver_rebuild(s, parts["major"], parts["minor"], parts["patch"])


# -- crypto KDFs --------------------------------------------------------------
# PHC-style strings with a salt derived deterministically from the input —
# the reference salts randomly (crypto.rs); deterministic salting keeps the
# function pure/testable while `compare` stays verification-compatible.


def _pbkdf2_phc(pw: str, iters: int = 10_000) -> str:
    salt = hashlib.sha256(pw.encode()).digest()[:16]
    dk = hashlib.pbkdf2_hmac("sha256", pw.encode(), salt, iters)
    return f"$pbkdf2-sha256$i={iters}${salt.hex()}${dk.hex()}"


def _scrypt_phc(pw: str, n: int = 2**14, r: int = 8, p: int = 1) -> str:
    salt = hashlib.sha256(pw.encode()).digest()[:16]
    dk = hashlib.scrypt(pw.encode(), salt=salt, n=n, r=r, p=p, maxmem=64 * 2**20)
    return f"$scrypt$ln={int(math.log2(n))},r={r},p={p}${salt.hex()}${dk.hex()}"


@F.pandas_udf(T.StringType())
def pbkdf2_generate(s: pd.Series) -> pd.Series:
    return pd.Series([_pbkdf2_phc(x or "") for x in s], dtype="object")


@F.pandas_udf(T.BooleanType())
def pbkdf2_compare(hash_: pd.Series, pw: pd.Series) -> pd.Series:
    def chk(h: str, p: str) -> bool:
        try:
            _, scheme, params, salt, dk = (h or "").split("$")
            iters = int(params.split("=")[1])
            got = hashlib.pbkdf2_hmac(
                "sha256", (p or "").encode(), bytes.fromhex(salt), iters
            )
            return got.hex() == dk
        except (ValueError, IndexError):
            return False

    return pd.Series([chk(h, p) for h, p in zip(hash_, pw)], dtype="bool")


@F.pandas_udf(T.StringType())
def scrypt_generate(s: pd.Series) -> pd.Series:
    return pd.Series([_scrypt_phc(x or "") for x in s], dtype="object")


@F.pandas_udf(T.BooleanType())
def scrypt_compare(hash_: pd.Series, pw: pd.Series) -> pd.Series:
    def chk(h: str, p: str) -> bool:
        try:
            _, scheme, params, salt, dk = (h or "").split("$")
            kv = dict(x.split("=") for x in params.split(","))
            got = hashlib.scrypt(
                (p or "").encode(), salt=bytes.fromhex(salt),
                n=2 ** int(kv["ln"]), r=int(kv["r"]), p=int(kv["p"]),
                maxmem=64 * 2**20,
            )
            return got.hex() == dk
        except (ValueError, KeyError):
            return False

    return pd.Series([chk(h, p) for h, p in zip(hash_, pw)], dtype="bool")


def _absent_kdf(name: str):
    def fn(*_a, **_k):
        raise NotImplementedError(
            f"crypto::{name} requires a KDF library not present in this image"
        )

    return fn


# -- encoding::cbor (RFC 8949 subset: null/bool/int/float/str/bytes/array/map)


def _cbor_enc(v) -> bytes:
    def head(major: int, n: int) -> bytes:
        if n < 24:
            return bytes([major << 5 | n])
        for code, fmt, lim in ((24, "B", 1 << 8), (25, ">H", 1 << 16),
                               (26, ">I", 1 << 32), (27, ">Q", 1 << 64)):
            if n < lim:
                return bytes([major << 5 | code]) + struct.pack(fmt, n)
        raise ValueError("int too large for CBOR")

    if v is None:
        return b"\xf6"
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if isinstance(v, int):
        return head(0, v) if v >= 0 else head(1, -1 - v)
    if isinstance(v, float):
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, bytes):
        return head(2, len(v)) + v
    if isinstance(v, str):
        b = v.encode()
        return head(3, len(b)) + b
    if isinstance(v, (list, tuple)):
        return head(4, len(v)) + b"".join(_cbor_enc(x) for x in v)
    if isinstance(v, dict):
        return head(5, len(v)) + b"".join(
            _cbor_enc(str(k)) + _cbor_enc(x) for k, x in v.items()
        )
    raise TypeError(f"CBOR: unsupported {type(v).__name__}")


def _cbor_dec(b: bytes, i: int = 0):
    ib = b[i]
    major, info = ib >> 5, ib & 0x1F
    i += 1
    if major <= 5:
        if info < 24:
            n = info
        else:
            width = 1 << (info - 24)
            n = int.from_bytes(b[i:i + width], "big")
            i += width
    if major == 0:
        return n, i
    if major == 1:
        return -1 - n, i
    if major == 2:
        return b[i:i + n], i + n
    if major == 3:
        return b[i:i + n].decode(), i + n
    if major == 4:
        out = []
        for _ in range(n):
            v, i = _cbor_dec(b, i)
            out.append(v)
        return out, i
    if major == 5:
        d = {}
        for _ in range(n):
            k, i = _cbor_dec(b, i)
            v, i = _cbor_dec(b, i)
            d[k] = v
        return d, i
    if ib == 0xF4:
        return False, i
    if ib == 0xF5:
        return True, i
    if ib == 0xF6:
        return None, i
    if ib == 0xFB:
        return struct.unpack(">d", b[i:i + 8])[0], i + 8
    raise ValueError(f"CBOR: unsupported byte 0x{ib:02x}")


@F.pandas_udf(T.BinaryType())
def cbor_encode_json(s: pd.Series) -> pd.Series:
    """JSON text → CBOR bytes (the column carries to_json(value))."""
    return pd.Series(
        [None if x is None else _cbor_enc(json.loads(x)) for x in s],
        dtype="object",
    )


@F.pandas_udf(T.StringType())
def cbor_decode_json(b: pd.Series) -> pd.Series:
    """CBOR bytes → canonical JSON text."""
    out = []
    for x in b:
        if x is None:
            out.append(None)
        else:
            v, _ = _cbor_dec(bytes(x))
            out.append(json.dumps(v, separators=(",", ":")))
    return pd.Series(out, dtype="object")


def cbor_encode(v) -> Column:
    return cbor_encode_json(F.to_json(_c(v)))


def cbor_decode(b) -> Column:
    return cbor_decode_json(_c(b))


# -- value::diff / value::patch (JSON-Patch, RFC 6902 subset) -----------------


@F.pandas_udf(T.StringType())
def _diff_json(a: pd.Series, b: pd.Series) -> pd.Series:
    def diff(x, y, path: str, ops: list) -> None:
        if x == y:
            return
        if isinstance(x, dict) and isinstance(y, dict):
            for k in x:
                if k not in y:
                    ops.append({"op": "remove", "path": f"{path}/{k}"})
                else:
                    diff(x[k], y[k], f"{path}/{k}", ops)
            for k in y:
                if k not in x:
                    ops.append({"op": "add", "path": f"{path}/{k}", "value": y[k]})
            return
        if path == "":
            ops.append({"op": "replace", "path": "/", "value": y})
        else:
            ops.append({"op": "replace", "path": path, "value": y})

    out = []
    for xa, xb in zip(a, b):
        ops: list = []
        diff(json.loads(xa) if xa is not None else None,
             json.loads(xb) if xb is not None else None, "", ops)
        out.append(json.dumps(ops, separators=(",", ":")))
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.StringType())
def _patch_json(a: pd.Series, p: pd.Series) -> pd.Series:
    def apply(doc, ops):
        for op in ops:
            path = [seg for seg in op["path"].split("/") if seg]
            if op["op"] == "replace" and (op["path"] == "/" or not path):
                doc = op["value"]
                continue
            tgt = doc
            for seg in path[:-1]:
                tgt = tgt[seg]
            if op["op"] in ("add", "replace"):
                tgt[path[-1]] = op["value"]
            elif op["op"] == "remove":
                tgt.pop(path[-1], None)
        return doc

    out = []
    for xa, xp in zip(a, p):
        doc = json.loads(xa) if xa is not None else None
        ops = json.loads(xp) if xp is not None else []
        out.append(json.dumps(apply(doc, ops), separators=(",", ":")))
    return pd.Series(out, dtype="object")


def value_diff(a, b) -> Column:
    """value::diff — JSON-Patch array (as JSON text) turning a into b."""
    return _diff_json(F.to_json(_c(a)), F.to_json(_c(b)))


def value_patch(a, patch) -> Column:
    """value::patch — apply a JSON-Patch (JSON text or column) to a."""
    p = patch if isinstance(patch, Column) else F.lit(patch)
    return _patch_json(F.to_json(_c(a)), p)


# -- rand:: extensions --------------------------------------------------------

_ULID_ALPHA = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def rand_ulid(ts=None) -> Column:
    """Crockford-base32 ULID: 10 time chars + 16 random chars; optional
    datetime pins the time prefix (fnc/rand.rs ulid Optional<Datetime>)."""
    ms = F.unix_millis(F.current_timestamp() if ts is None else ts)
    chars = []
    for i in range(9, -1, -1):
        idx = F.shiftright(ms, 5 * i).bitwiseAND(F.lit(31))
        chars.append(F.substring(F.lit(_ULID_ALPHA), idx + 1, 1))
    for _ in range(16):
        idx = (F.rand() * 32).cast("int")
        chars.append(F.substring(F.lit(_ULID_ALPHA), idx + 1, 1))
    return F.concat(*chars)


def rand_uuid_v4() -> Column:
    return F.uuid()


def rand_uuid_v7(ts=None) -> Column:
    """UUIDv7: 48-bit unix-ms prefix + random tail (RFC 9562 layout);
    optional datetime pins the time prefix."""
    ms = F.unix_millis(F.current_timestamp() if ts is None else ts)
    hex12 = F.lpad(F.lower(F.conv(ms.cast("string"), 10, 16)), 12, "0")
    r = F.md5(F.rand().cast("string"))
    return F.concat_ws(
        "-",
        F.substring(hex12, 1, 8),
        F.substring(hex12, 9, 4),
        F.concat(F.lit("7"), F.substring(r, 1, 3)),
        F.concat(F.lit("8"), F.substring(r, 4, 3)),
        F.substring(r, 7, 12),
    )


def rand_id(lo=None, hi=None) -> Column:
    """rand::id([lo, hi]) — random lowercase-alnum id chars, default 20,
    LIMIT 64 (fnc/rand.rs:85-127)."""
    from surrealdb_spark.functions.misc_fns import _ID_CHARS, _rand_chars

    return _rand_chars(_ID_CHARS, lo, hi, "rand::id", 64, 20)


def rand_time(lo=None, hi=None) -> Column:
    """rand::time([min, max]) — uniform instant in [min, max] (inclusive);
    bounds are epoch-second ints or datetimes (fnc/rand.rs:204-214)."""
    import datetime as _dt

    def secs(v, default):
        if v is None:
            return F.lit(default)
        if isinstance(v, Column):
            return F.unix_timestamp(v.cast("timestamp"))
        if isinstance(v, _dt.datetime):
            return F.lit(int(v.timestamp()))
        return F.lit(int(v))

    lo_c, hi_c = secs(lo, 0), secs(hi, 2_000_000_000)
    lo_s = F.least(lo_c, hi_c).cast("double")
    hi_s = F.greatest(lo_c, hi_c).cast("double")
    return F.timestamp_seconds(
        (lo_s + F.rand() * (hi_s - lo_s + 1)).cast("bigint"))


def rand_duration(lo_ns=0, hi_ns=10**12) -> Column:
    """rand::duration(d1, d2) — uniform duration between the two bounds
    (inclusive; fnc/rand.rs:184-200).  Bounds are nanosecond ints or
    duration struct Columns."""
    from surrealdb_spark.values import duration as _mk_dur

    def ns_of(v):
        if isinstance(v, Column):
            return v.getField("nanos")
        return F.lit(int(v))

    lo_c, hi_c = ns_of(lo_ns), ns_of(hi_ns)
    lo = F.least(lo_c, hi_c).cast("double")
    hi = F.greatest(lo_c, hi_c).cast("double")
    ns = (lo + F.rand() * (hi - lo)).cast("bigint")
    return _mk_dur(0, ns)


# -- vector extras ------------------------------------------------------------


def vector_angle(a, b) -> Column:
    from surrealdb_spark.functions.vector import cosine_similarity

    return F.acos(F.least(F.greatest(cosine_similarity(a, b), F.lit(-1.0)),
                          F.lit(1.0)))


@F.pandas_udf(T.DoubleType())
def spearman_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    """Spearman rank correlation (superset — Unimplemented in the
    reference, vector.rs `spearman`)."""
    out = []
    for x, y in zip(a, b):
        if x is None or y is None or len(x) != len(y) or len(x) < 2:
            out.append(None)
            continue
        sx = pd.Series(list(x)).rank()
        sy = pd.Series(list(y)).rank()
        out.append(float(sx.corr(sy)))
    return pd.Series(out, dtype="float64")


def mahalanobis(*_a):
    raise NotImplementedError(
        "vector::distance::mahalanobis is Unimplemented in the reference "
        "(core/src/fnc/vector.rs) — kept unimplemented for parity"
    )


def knn_distance() -> Column:
    """vector::distance::knn — the distance computed by the enclosing <|k|>
    operator; our KNN operators emit it as the `_distance` column."""
    return F.col("_distance")


# -- array::sort_natural_lexical ----------------------------------------------


@F.pandas_udf(T.ArrayType(T.StringType()))
def sort_natural_lexical(arr: pd.Series) -> pd.Series:
    import re

    def key(s: str):
        return [int(t) if t.isdigit() else t.lower()
                for t in re.split(r"(\d+)", s or "") if t != ""]

    return pd.Series(
        [None if a is None else sorted([str(x) for x in a], key=key)
         for a in arr],
        dtype="object",
    )


# -- session:: ----------------------------------------------------------------


class SessionContext:
    """Driver-side session properties (the reference reads these from the
    live connection; fnc/session.rs). Analytics sessions get stable
    defaults; `configure()` overrides."""

    _state = {"ns": "analytics", "db": "main", "id": None, "ip": None,
              "origin": None, "ac": None, "rd": None, "token": None}

    @classmethod
    def configure(cls, **kv) -> None:
        cls._state.update(kv)

    @classmethod
    def get(cls, key: str):
        return cls._state.get(key)


def session_fn(key: str):
    def fn() -> Column:
        return F.lit(SessionContext.get(key))

    return fn


# -- schema:: / sequence:: ----------------------------------------------------

_SCHEMA_PROVIDER = None  # set by StatementRunner / Catalog users


def set_schema_provider(fn) -> None:
    global _SCHEMA_PROVIDER
    _SCHEMA_PROVIDER = fn


def schema_table_exists(name) -> Column:
    if _SCHEMA_PROVIDER is None:
        return F.lit(False)
    nm = name if isinstance(name, str) else None
    if nm is None:
        raise ValueError("schema::table::exists needs a literal table name")
    return F.lit(bool(_SCHEMA_PROVIDER(nm)))
