"""Oracle-checked samplers over the scalar function namespaces (§2.11) —
string::, time::, geo:: expressions evaluated per-row against DuckDB
equivalents (libm trig/log parity verified empirically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.functions import geo_fns as G
from surrealdb_spark.functions import geometry as GM
from surrealdb_spark.functions import string_fns as S
from surrealdb_spark.functions import time_fns as TM
from surrealdb_spark.suite import query


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           length(c_name) AS name_len,
           reverse(c_name) AS rev,
           regexp_replace(regexp_replace(lower(c_name), '[^a-z0-9]+', '-', 'g'),
                          '(^-+)|(-+$)', '', 'g') AS slugged,
           levenshtein(c_name, 'Customer#000000042') AS lev,
           starts_with(c_name, 'Customer') AS is_cust,
           substring(c_name, 10, 9) AS key_digits
    FROM customer WHERE c_custkey % 100 = 0
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # string:: namespace sampler (core/src/fnc/string.rs).
    cust = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") % 100 == 0)
    return cust.select(
        "c_custkey",
        S.uppercase("c_name").alias("uname"),
        S.len_("c_name").alias("name_len"),
        S.reverse("c_name").alias("rev"),
        S.slug("c_name").alias("slugged"),
        S.levenshtein("c_name", F.lit("Customer#000000042")).alias("lev"),
        S.starts_with("c_name", F.lit("Customer")).alias("is_cust"),
        S.slice_("c_name", 9, 18).alias("key_digits"),
    )


@query(
    "time_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           dayofmonth(o_orderdate) AS d,
           isodow(o_orderdate) AS wd,
           dayofyear(o_orderdate) AS yd,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_floor,
           CASE WHEN (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
                  OR year(o_orderdate) % 400 = 0 THEN TRUE ELSE FALSE END AS leap
    FROM orders WHERE o_orderkey % 250 = 0
    """,
)
def time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time:: namespace sampler (core/src/fnc/time.rs).
    ords = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") % 250 == 0)
    return ords.select(
        "o_orderkey",
        TM.year("o_orderdate").alias("y"),
        TM.month("o_orderdate").alias("m"),
        TM.day("o_orderdate").alias("d"),
        TM.wday("o_orderdate").alias("wd"),
        TM.yday("o_orderdate").alias("yd"),
        TM.unix("o_orderdate").alias("unix_s"),
        F.date_format(TM.floor("o_orderdate", "month"), "yyyy-MM-dd").alias("month_floor"),
        TM.is_leap_year("o_orderdate").alias("leap"),
    )


_SQL_PT = """
  struct_pack(lon := CAST(c_custkey % 360 - 180 AS DOUBLE) * 0.9e0,
              lat := CAST(c_custkey % 170 - 85 AS DOUBLE) * 0.9e0)
"""


@query(
    "geo_functions",
    oracle=f"""
    SELECT c_custkey,
           (2 * 6371008.8e0) * asin(sqrt(
             sin((radians(48.8566e0) - radians(p.lat)) / 2)
               * sin((radians(48.8566e0) - radians(p.lat)) / 2)
             + cos(radians(p.lat)) * cos(radians(48.8566e0))
               * (sin((radians(2.3522e0) - radians(p.lon)) / 2)
                  * sin((radians(2.3522e0) - radians(p.lon)) / 2))
           )) AS dist_to_paris,
           p.lon >= -180 AND p.lon <= 180 AND p.lat >= -90 AND p.lat <= 90 AS valid,
           abs(p.lon) + abs(p.lat) <= 40 AS in_diamond,
           NOT (p.lon >= -90 AND p.lon <= 0 AND p.lat >= 0 AND p.lat <= 85)
             AS out_box
    FROM (SELECT c_custkey, {_SQL_PT} AS p FROM customer WHERE c_custkey % 150 = 0)
    """,
)
def geo_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # geo:: namespace sampler: haversine distance + validity over
    # key-derived synthetic coordinates (core/src/fnc/geo.rs), plus the
    # geometry predicates (val/geometry.rs contains/intersects): the engine
    # runs the general even-odd ray-cast / segment tests; the oracle states
    # the closed form of the same shapes (diamond |x|+|y|<=40; box).
    cust = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") % 150 == 0)
    lon = (F.col("c_custkey") % 360 - 180).cast("double") * 0.9
    lat = (F.col("c_custkey") % 170 - 85).cast("double") * 0.9
    pt = G.point(lon, lat)
    paris = G.point(F.lit(2.3522), F.lit(48.8566))
    # Geometry operands as SQL fragments (GM.Frag): the INSIDE/OUTSIDE
    # predicates then compile as ONE parsed expression instead of ~14k py4j
    # Column calls (r13; build 2.3 s → ~0.1 s, same expressions, same
    # results — the fragments mirror the Column arithmetic exactly).
    gpt = GM.frag_point("(CAST(c_custkey % 360 - 180 AS DOUBLE) * 0.9D)",
                        "(CAST(c_custkey % 170 - 85 AS DOUBLE) * 0.9D)")
    diamond = GM.frag_from_coords(
        "Polygon", [[[40.0, 0.0], [0.0, 40.0], [-40.0, 0.0], [0.0, -40.0], [40.0, 0.0]]]
    )
    box = GM.frag_from_coords(
        "Polygon", [[[-90.0, 0.0], [0.0, 0.0], [0.0, 85.0], [-90.0, 85.0], [-90.0, 0.0]]]
    )
    return cust.select(
        "c_custkey",
        G.distance(pt, paris).alias("dist_to_paris"),
        G.is_valid(pt).alias("valid"),
        GM.g_inside(gpt, diamond).alias("in_diamond"),
        GM.outside(gpt, box).alias("out_box"),
    )


@query(
    "type_functions",
    oracle="""
    SELECT c_custkey,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS rt_int,
           CAST(c_custkey % 2 AS BOOLEAN) AS odd,
           TRUE AS isi, TRUE AS iss, TRUE AS isn, FALSE AS isf,
           'float' AS ty_bal, 'string' AS ty_name,
           'customer:' || CAST(c_custkey AS VARCHAR) AS rid,
           'customer:' || CAST(c_custkey AS VARCHAR) AS rid_ok,
           TRUE AS isr,
           '6b29fc40-ca47-1067-b31d-00dd010662da' AS uid,
           'customer' AS tbl,
           1.5e0 AS pt_lon,
           CAST(5400000000000 AS BIGINT) AS dur_ns,
           '2020-01-03 04:05:06' AS dt_str,
           CAST(CAST('42.5' AS DECIMAL(38,10)) AS VARCHAR) AS dec_str,
           CAST('42.5' AS DOUBLE) AS num
    FROM customer WHERE c_custkey % 150 = 0
    """,
)
def type_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # type:: namespace through the SurrealQL parser (fnc/mod.rs:471-515):
    # casts, constructors (thing/record/uuid/point/duration/decimal), and
    # the is_* predicates resolved statically on column types.
    from surrealdb_spark.sql import surql

    return surql(
        spark,
        "SELECT c_custkey, "
        "type::int(type::string(c_custkey)) AS rt_int, "
        "type::bool(c_custkey % 2) AS odd, "
        "type::is_int(c_custkey) AS isi, "
        "type::is_string(c_name) AS iss, "
        "type::is_number(c_acctbal) AS isn, "
        "type::is_float(c_custkey) AS isf, "
        "type::of(c_acctbal) AS ty_bal, "
        "type::of(c_name) AS ty_name, "
        "type::thing('customer', c_custkey) AS rid, "
        "type::record('customer', c_custkey) AS rid_ok, "
        "type::is_record(type::thing('customer', c_custkey)) AS isr, "
        "type::uuid('6B29FC40-CA47-1067-B31D-00DD010662DA') AS uid, "
        "type::table('customer') AS tbl, "
        "type::point([1.5, 2.5]).lon AS pt_lon, "
        "type::duration('1h30m').nanos AS dur_ns, "
        "time::format(type::datetime('2020-01-03T04:05:06'), 'yyyy-MM-dd HH:mm:ss') AS dt_str, "
        "type::string(type::decimal('42.5')) AS dec_str, "
        "type::number('42.5') AS num "
        "FROM customer WHERE c_custkey % 150 = 0",
        sf_dir,
    )
