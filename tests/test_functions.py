"""Golden-output tests for the scalar function library — the analogue of the
reference's language-tests corpus (language-tests/tests/language/functions/),
asserting exact expected values per function.

Cases are (builder-lambda, expected): Column construction must be lazy
because pytest collects parameters before the SparkSession exists.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from surrealdb_spark.functions import array as A
from surrealdb_spark.functions import geo_fns as G
from surrealdb_spark.functions import math_fns as M
from surrealdb_spark.functions import misc_fns as X
from surrealdb_spark.functions import string_fns as S
from surrealdb_spark.functions import time_fns as TM
from surrealdb_spark.functions import type_fns as TY
from surrealdb_spark.functions.registry import REGISTRY, coverage


def one(spark, col, alias="r"):
    return spark.range(1).select(col.alias(alias)).first()[alias]


def _run_cases(spark, cases):
    cols = [mk().alias(f"c{i}") for i, (mk, _) in enumerate(cases)]
    row = spark.range(1).select(*cols).first()
    failures = []
    for i, (_, expected) in enumerate(cases):
        got = row[f"c{i}"]
        if isinstance(expected, float):
            ok = got is not None and abs(got - expected) < 1e-12
        else:
            ok = got == expected
        if not ok:
            failures.append(f"case {i}: got {got!r}, want {expected!r}")
    assert not failures, "; ".join(failures)


def ARR():
    return F.array(*[F.lit(x) for x in [3, 1, 4, 1, 5]])


def lits(*xs):
    return F.array(*[F.lit(x) for x in xs])


ARRAY_CASES = [
    (lambda: A.at(ARR(), 0), 3),
    (lambda: A.at(ARR(), -1), 5),
    (lambda: A.len_(ARR()), 5),
    (lambda: A.distinct(ARR()), [3, 1, 4, 5]),
    (lambda: A.sort_asc(ARR()), [1, 1, 3, 4, 5]),
    (lambda: A.sort_desc(ARR()), [5, 4, 3, 1, 1]),
    (lambda: A.pop(ARR()), 5),  # pop returns the last VALUE (array.rs:603)
    (lambda: A.prepend(ARR(), F.lit(9)), [9, 3, 1, 4, 1, 5]),
    (lambda: A.append(ARR(), F.lit(9)), [3, 1, 4, 1, 5, 9]),
    (lambda: A.add(ARR(), F.lit(4)), [3, 1, 4, 1, 5]),
    (lambda: A.add(ARR(), F.lit(9)), [3, 1, 4, 1, 5, 9]),
    (lambda: A.insert(ARR(), F.lit(7), 1), [3, 7, 1, 4, 1, 5]),
    (lambda: A.remove(ARR(), 1), [3, 4, 1, 5]),
    (lambda: A.slice_(ARR(), 1, 3), [1, 4]),  # [start, end) — fnc/array.rs slice
    (lambda: A.index_of(ARR(), F.lit(4)), 2),
    (lambda: A.index_of(ARR(), F.lit(99)), None),
    (lambda: A.includes(ARR(), F.lit(5)), True),
    (lambda: A.max_(ARR()), 5),
    (lambda: A.min_(ARR()), 1),
    (lambda: A.fold(ARR(), F.lit(0), lambda a, x: a + x), 14),
    (lambda: A.reduce(ARR(), lambda a, x: a + x), 14),
    (lambda: A.map_(ARR(), lambda x: x * 2), [6, 2, 8, 2, 10]),
    (lambda: A.filter_(ARR(), lambda x: x > 2), [3, 4, 5]),
    (lambda: A.filter_index(ARR(), lambda x: x == 1), [1, 3]),
    (lambda: A.find(ARR(), lambda x: x > 3), 4),
    (lambda: A.find_index(ARR(), lambda x: x > 3), 2),
    (lambda: A.every(ARR(), lambda x: x > 0), True),
    (lambda: A.some(ARR(), lambda x: x > 4), True),
    (lambda: A.clump(ARR(), 2), [[3, 1], [4, 1], [5]]),
    (lambda: A.windows(ARR(), 3), [[3, 1, 4], [1, 4, 1], [4, 1, 5]]),
    (lambda: A.windows(lits(1, 2), 3), []),
    (lambda: A.swap(ARR(), 0, 4), [5, 1, 4, 1, 3]),
    (lambda: A.matches(ARR(), F.lit(1)), [False, True, False, True, False]),
    (lambda: A.combine(lits(1, 2), lits(3)), [[1, 3], [2, 3]]),
    (lambda: A.union(lits(1, 2), lits(2, 3)), [1, 2, 3]),
    (lambda: A.intersect(lits(1, 2), lits(2, 3)), [2]),
    (lambda: A.complement(lits(1, 2), lits(2)), [1]),
    (lambda: A.difference(lits(1, 2), lits(2, 3)), [1, 3]),
    (lambda: A.transpose(F.array(lits(1, 2), lits(3, 4))), [[1, 3], [2, 4]]),
    (lambda: A.group(F.array(lits(1, 2), lits(2))), [1, 2]),
    (lambda: A.reverse(ARR()), [5, 1, 4, 1, 3]),
    (lambda: A.first(ARR()), 3),
    (lambda: A.last(ARR()), 5),
    (lambda: A.is_empty(ARR()), False),
    (lambda: A.join(ARR(), "-"), "3-1-4-1-5"),
    (lambda: A.fill(ARR(), F.lit(0)), [0, 0, 0, 0, 0]),
    (lambda: A.repeat(F.lit("x"), 3), ["x", "x", "x"]),
    (lambda: A.range_(5, 8), [5, 6, 7]),  # [start, end) — fnc/array.rs range
    (lambda: A.boolean_and(lits(True, True), lits(True, False)), [True, False]),
    (lambda: A.boolean_xor(lits(True, True), lits(True, False)), [False, True]),
    (lambda: A.logical_or(lits(0, 7), lits(3, 0)), [3, 7]),
    (lambda: A.sort_natural(lits("a10", "a2", "a1")), ["a1", "a2", "a10"]),
]


def test_array_golden(spark):
    _run_cases(spark, ARRAY_CASES)


STRING_CASES = [
    (lambda: S.slug(F.lit("Hello, World!")), "hello-world"),
    (lambda: S.capitalize(F.lit("hello world")), "Hello World"),
    (lambda: S.len_(F.lit("héllo")), 5),
    (lambda: S.reverse(F.lit("abc")), "cba"),
    (lambda: S.repeat(F.lit("ab"), 3), "ababab"),
    (lambda: S.replace(F.lit("aaa"), F.lit("a"), F.lit("b")), "bbb"),
    (lambda: S.slice_(F.lit("abcdef"), 1, 4), "bcd"),
    (lambda: S.slice_(F.lit("abcdef"), 0, -1), "abcde"),
    (lambda: S.slice_(F.lit("abcdef"), -2), "ef"),
    (lambda: S.contains(F.lit("abc"), F.lit("bc")), True),
    (lambda: S.starts_with(F.lit("abc"), F.lit("ab")), True),
    (lambda: S.ends_with(F.lit("abc"), F.lit("bc")), True),
    (lambda: S.words(F.lit("  a  b c ")), ["a", "b", "c"]),
    (lambda: S.matches(F.lit("abc123"), r"^[a-z]+\d+$"), True),
    (lambda: S.split(F.lit("a.b.c"), "."), ["a", "b", "c"]),
    (lambda: S.levenshtein(F.lit("kitten"), F.lit("sitting")), 3),
    (lambda: S.hamming(F.lit("karolin"), F.lit("kathrin")), 3),
    (lambda: S.hamming(F.lit("abc"), F.lit("ab")), None),
    (lambda: S.is_("email", F.lit("a@b.co")), True),
    (lambda: S.is_("email", F.lit("nope")), False),
    (lambda: S.is_("uuid", F.lit("123e4567-e89b-12d3-a456-426614174000")), True),
    (lambda: S.is_("semver", F.lit("1.2.3-rc.1")), True),
    (lambda: S.semver_part(F.lit("1.22.3"), "minor"), 22),
    (lambda: S.semver_compare(F.lit("1.2.3"), F.lit("1.10.0")), -1),
    (lambda: S.html_encode(F.lit('<a href="x">')), "&lt;a href=&quot;x&quot;&gt;"),
    (lambda: S.html_sanitize(F.lit("<b>hi</b> there")), "hi there"),
]


def test_string_golden(spark):
    _run_cases(spark, STRING_CASES)


def test_string_similarity_udfs(spark):
    df = spark.createDataFrame([Row(a="martha", b="marhta")])
    r = df.select(
        S.jaro("a", "b").alias("j"),
        S.jaro_winkler("a", "b").alias("jw"),
        S.damerau("a", "b").alias("dl"),
        S.sorensen_dice("a", "b").alias("sd"),
        S.smithwaterman("a", "b").alias("sw"),
    ).first()
    assert abs(r.j - 0.9444444444444445) < 1e-12
    assert abs(r.jw - 0.9611111111111111) < 1e-12
    assert r.dl == 1  # one transposition
    assert abs(r.sd - 0.4) < 1e-12 and r.sw > 0


def DARR():
    return F.array(*[F.lit(float(x)) for x in [4.0, 1.0, 7.0, 2.0]])


MATH_CASES = [
    (lambda: M.sum_(DARR()), 14.0),
    (lambda: M.mean(DARR()), 3.5),
    (lambda: M.product(DARR()), 56.0),
    (lambda: M.max_(DARR()), 7.0),
    (lambda: M.min_(DARR()), 1.0),
    (lambda: M.spread(DARR()), 6.0),
    (lambda: M.median(DARR()), 3.0),
    (lambda: M.percentile(DARR(), 25.0), 1.75),
    (lambda: M.nearestrank(DARR(), 50.0), 2.0),
    (lambda: M.mode(lits(1, 2, 2, 3)), 2),
    (lambda: M.clamp(F.lit(15), F.lit(0), F.lit(10)), 10),
    (lambda: M.lerp(F.lit(0.0), F.lit(10.0), F.lit(0.25)), 2.5),
    (lambda: M.fixed(F.lit(3.14159), 2), 3.14),
    (lambda: M.sign(F.lit(-3.0)), -1.0),
    (lambda: M.top(DARR(), 2), [4.0, 7.0]),
    (lambda: M.bottom(DARR(), 2), [1.0, 2.0]),
    (lambda: M.interquartile(DARR()), 3.0),
    (lambda: M.midhinge(DARR()), 3.25),
]


def test_math_golden(spark):
    _run_cases(spark, MATH_CASES)


def test_math_variance_stddev(spark):
    assert abs(one(spark, M.variance(DARR())) - 7.0) < 1e-9
    assert abs(one(spark, M.stddev(DARR())) - 7.0**0.5) < 1e-9


def TS():
    return F.lit("2024-03-15 13:45:30").cast("timestamp")


TIME_CASES = [
    (lambda: TM.year(TS()), 2024),
    (lambda: TM.month(TS()), 3),
    (lambda: TM.day(TS()), 15),
    (lambda: TM.hour(TS()), 13),
    (lambda: TM.minute(TS()), 45),
    (lambda: TM.second(TS()), 30),
    (lambda: TM.wday(TS()), 5),  # Friday
    (lambda: TM.yday(TS()), 75),
    (lambda: TM.is_leap_year(TS()), True),
    (lambda: TM.format_(TS(), "%Y/%m/%d %H:%M"), "2024/03/15 13:45"),
    (lambda: TM.unix(TS()), 1710510330),
    (lambda: TM.millis(TS()), 1710510330000),
]


def test_time_golden(spark):
    _run_cases(spark, TIME_CASES)


def test_time_bucketing(spark):
    assert str(one(spark, TM.floor(TS(), "hour"))) == "2024-03-15 13:00:00"
    assert str(one(spark, TM.ceil(TS(), "hour"))) == "2024-03-15 14:00:00"
    assert str(one(spark, TM.round_(TS(), "hour"))) == "2024-03-15 14:00:00"
    assert str(one(spark, TM.set_field(TS(), "day", F.lit(1)))) == "2024-03-01 13:45:30"
    assert str(one(spark, TM.from_millis(F.lit(0)))) == "1970-01-01 00:00:00"


def test_type_casts(spark):
    assert one(spark, TY.int_(F.lit("42"))) == 42
    assert one(spark, TY.float_(F.lit("2.5"))) == 2.5
    assert one(spark, TY.bool_(F.lit("true"))) is True
    assert one(spark, TY.thing(F.lit("person"), F.lit(8))) == "person:8"
    d = one(spark, TY.duration(F.lit("1y2w3d4h5m6s")))
    assert d.months == 0  # y = 365 d of seconds (val/duration.rs), no months
    assert d.nanos == (
        (((365 + 2 * 7 + 3) * 24 + 4) * 3600) + 5 * 60 + 6
    ) * 1_000_000_000
    assert one(spark, TY.is_record(F.lit("person:1"))) is True


def test_object_fns(spark):
    m = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    assert sorted(one(spark, X.obj_keys(m))) == ["a", "b"]
    assert one(spark, X.obj_len(m)) == 2
    assert dict(one(spark, X.obj_remove(m, F.lit("a")))) == {"b": 2}


def test_duration_fns(spark):
    d = X.dur_from("hours", F.lit(30))
    assert one(spark, X.dur_unit(d, "hours")) == 30
    assert one(spark, X.dur_unit(d, "days")) == 1
    y = X.dur_from("years", F.lit(2))
    assert one(spark, X.dur_years(y)) == 2
    mo = X.dur_from("months", F.lit(24))
    assert one(spark, X.dur_months(mo)) == 24


def test_crypto_and_encoding(spark):
    assert one(spark, X.crypto_md5(F.lit("abc"))) == "900150983cd24fb0d6963f7d28e17f72"
    assert (
        one(spark, X.crypto_sha256(F.lit("abc")))
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert one(spark, X.crypto_joaat(F.lit("a"))) == 0xCA2E9442
    assert one(spark, X.base64_encode(F.lit("hi"))) == "aGk"  # padless, fnc/encoding.rs
    assert one(spark, X.base64_decode(F.lit("aGk"))) == b"hi"  # decode yields bytes


def test_parse_fns(spark):
    url = F.lit("https://example.com:8080/path?q=1#frag")
    assert one(spark, X.parse_url_domain(url)) == "example.com"
    assert one(spark, X.parse_url_path(url)) == "/path"
    assert one(spark, X.parse_url_query(url)) == "q=1"
    assert one(spark, X.parse_url_fragment(url)) == "frag"
    assert one(spark, X.parse_url_port(url)) == 8080
    assert one(spark, X.parse_email_user(F.lit("bob@x.io"))) == "bob"
    assert one(spark, X.parse_email_host(F.lit("bob@x.io"))) == "x.io"


def test_geo_fns(spark):
    paris = G.point(F.lit(2.3522), F.lit(48.8566))
    london = G.point(F.lit(-0.1276), F.lit(51.5072))
    d = one(spark, G.distance(paris, london))
    assert abs(d - 343_940) < 2_000  # ~344 km
    b = one(spark, G.bearing(paris, london))
    # raw atan2 degrees in [-180, 180] (reference geo crate bearing)
    assert -60 < b < -20
    assert one(spark, G.hash_encode(paris, 6)) == "u09tvw"
    back = one(spark, G.hash_decode(F.lit("u09tvw")))
    assert abs(back.lon - 2.3522) < 0.01 and abs(back.lat - 48.8566) < 0.01
    assert one(spark, G.is_valid(paris)) is True


def test_registry_coverage():
    cov = coverage()
    assert cov["array"] >= 55
    assert cov["string"] >= 40
    assert cov["math"] >= 38
    assert cov["time"] >= 35
    assert len(REGISTRY) >= 250


# -- round-2 long tail: extra_fns + filebucket --------------------------------

EXTRA_CASES = [
    (lambda: REGISTRY["string::distance::normalized_levenshtein"](
        F.lit("kitten"), F.lit("sitting")), 1.0 - 3 / 7),
    (lambda: REGISTRY["string::distance::normalized_damerau_levenshtein"](
        F.lit("ca"), F.lit("ac")), 0.5),
    (lambda: REGISTRY["string::distance::osa"](F.lit("ca"), F.lit("ac")), 1),
    (lambda: REGISTRY["string::similarity::fuzzy"](
        F.lit("some text"), F.lit("zzz")), 0),
    (lambda: REGISTRY["string::semver::inc::major"](F.lit("1.2.3")), "2.0.0"),
    (lambda: REGISTRY["string::semver::inc::minor"](F.lit("1.2.3")), "1.3.0"),
    (lambda: REGISTRY["string::semver::inc::patch"](F.lit("1.2.3")), "1.2.4"),
    (lambda: REGISTRY["string::semver::set::minor"](F.lit("1.2.3"), 9), "1.9.3"),
    (lambda: REGISTRY["string::is_ipv4"](F.lit("10.0.0.256")), False),
    (lambda: REGISTRY["string::is_ipv4"](F.lit("10.0.0.25")), True),
    (lambda: REGISTRY["string::is_ipv6"](F.lit("fe80::1")), True),
    (lambda: REGISTRY["string::is_alpha"](F.lit("abc")), True),
    (lambda: REGISTRY["math::acot"](F.lit(1.0)), 0.7853981633974483),
    (lambda: REGISTRY["bytes::len"](F.lit(b"abcd")), 4),
    (lambda: REGISTRY["vector::angle"](lits(1.0, 0.0), lits(0.0, 1.0)),
     1.5707963267948966),
    (lambda: REGISTRY["vector::similarity::spearman"](
        lits(1.0, 2.0, 3.0), lits(10.0, 20.0, 30.0)), 1.0),
    (lambda: REGISTRY["array::sort_natural_lexical"](
        lits("a10", "a2", "B1")), ["a2", "a10", "B1"]),
    (lambda: REGISTRY["set::first"](lits(3, 1, 3)), 1),  # BTree order, val/set.rs
    (lambda: REGISTRY["set::max"](lits(3, 1, 3)), 3),
    (lambda: REGISTRY["set::flatten"](
        F.array(lits(1, 2), lits(2, 3))), [1, 2, 3]),
    (lambda: REGISTRY["duration::from_mins"](F.lit(2)),
     Row(months=0, nanos=120_000_000_000)),
    (lambda: REGISTRY["time::is_leap_year"](
        F.lit("2024-06-01").cast("timestamp")), True),
    (lambda: REGISTRY["time::from_millis"](F.lit(86_400_000)).cast("string"),
     "1970-01-02 00:00:00"),
    (lambda: REGISTRY["meta::tb"](F.lit("person:1")), "person"),
    (lambda: REGISTRY["meta::id"](F.lit("person:1")), "1"),
    (lambda: REGISTRY["session::ns"](), "analytics"),
    (lambda: REGISTRY["value::diff"](
        F.struct(F.lit(1).alias("a")), F.struct(F.lit(2).alias("a"))),
     '[{"op":"replace","path":"/a","value":2}]'),
    (lambda: REGISTRY["value::patch"](
        F.struct(F.lit(1).alias("a")),
        '[{"op":"replace","path":"/a","value":5}]'), '{"a":5}'),
    (lambda: REGISTRY["encoding::cbor::decode"](
        REGISTRY["encoding::cbor::encode"](
            F.struct(F.lit(7).alias("n"), F.lit("x").alias("s")))),
     '{"n":7,"s":"x"}'),
    (lambda: REGISTRY["file::bucket"](F.lit("file:/media/img/1.png")), "media"),
    (lambda: REGISTRY["file::key"](F.lit("file:/media/img/1.png")), "/img/1.png"),
]


def test_extra_fns_golden(spark):
    _run_cases(spark, EXTRA_CASES)


def test_kdf_roundtrip(spark):
    h = one(spark, REGISTRY["crypto::pbkdf2"](F.lit("pw")))
    assert h.startswith("$pbkdf2-sha256$")
    assert one(spark, REGISTRY["crypto::pbkdf2::compare"](F.lit(h), F.lit("pw"))) is True
    assert one(spark, REGISTRY["crypto::pbkdf2::compare"](F.lit(h), F.lit("xx"))) is False
    s = one(spark, REGISTRY["crypto::scrypt"](F.lit("pw")))
    assert one(spark, REGISTRY["crypto::scrypt::compare"](F.lit(s), F.lit("pw"))) is True
    with pytest.raises(NotImplementedError):
        REGISTRY["crypto::argon2"](F.lit("x"))
    with pytest.raises(NotImplementedError):
        REGISTRY["http::get"]("http://x")


def test_rand_shapes(spark):
    row = spark.range(1).select(
        REGISTRY["rand::ulid"]().alias("ulid"),
        REGISTRY["rand::uuid::v7"]().alias("u7"),
        REGISTRY["rand::id"]().alias("rid"),
        REGISTRY["rand::time"]().alias("rt"),
        REGISTRY["rand::duration"]().alias("rd"),
    ).first()
    import re
    assert re.fullmatch(r"[0-9A-HJKMNP-TV-Z]{26}", row["ulid"])
    assert re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}",
        row["u7"])
    import re as _re
    assert _re.fullmatch(r"[a-z0-9]{20}", row["rid"])
    assert row["rd"]["nanos"] >= 0  # duration struct (values.py)


def test_filebucket(tmp_path):
    from surrealdb_spark.pipeline.filebucket import (
        bucket, define_bucket, f_exists, f_get, f_put,
    )

    define_bucket("media", str(tmp_path / "media"))
    ptr = "file:/media/img/1.bin"
    assert f_put(ptr, b"\x01\x02") is None  # mutators return Value::None
    assert f_get(ptr) == b"\x01\x02"
    assert f_exists(ptr) is True
    b = bucket("media")
    b.put_if_not_exists("img/1.bin", b"zz")  # no-op: already exists
    assert b.get("img/1.bin") == b"\x01\x02"
    assert [e["file"] for e in b.list()] == ["file:/media/img/1.bin"]
    assert b.head("img/1.bin")["size"] == 2
    b.copy("img/1.bin", "img/2.bin")
    assert b.exists("img/2.bin")
    b.rename("img/2.bin", "img/3.bin")
    assert not b.exists("img/2.bin") and b.exists("img/3.bin")
    b.delete("img/3.bin")
    assert not b.exists("img/3.bin")
    with pytest.raises(ValueError):
        b.get("../escape")


def test_sequence_nextval(spark):
    import uuid as _uuid

    from surrealdb_spark.export import define_sequence

    name = f"t_{_uuid.uuid4().hex[:8]}"
    define_sequence(name)  # nextval on an undefined sequence errors
    v1 = one(spark, REGISTRY["sequence::nextval"](name))
    v2 = one(spark, REGISTRY["sequence::nextval"](name))
    assert (v1, v2) == (1, 2)
