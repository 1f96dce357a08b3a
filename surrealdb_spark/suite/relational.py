"""Relational operator suite: scans, filter/project, aggregate, sort/limit,
split (explode), union, distinct, window, time bucketing.

Reference parity targets (surrealdb/surrealdb):
  - TableScan        core/src/exec/operators/scan/table.rs:39
  - CountScan        core/src/exec/operators/scan/count.rs:47
  - Filter           core/src/exec/operators/filter.rs:24
  - Project          core/src/exec/operators/project.rs:118
  - Aggregate        core/src/exec/operators/aggregate.rs:23 (+ GROUP ALL)
  - Sort/SortTopK    core/src/exec/operators/sort/{full_sort,topk}.rs
  - Limit            core/src/exec/operators/limit.rs:21
  - Split            core/src/exec/operators/split.rs:13
  - Union            core/src/exec/operators/union.rs:19
  - time::group      core/src/fnc/time.rs (tumbling-bucket analogue)

All plans are declarative DataFrame ops — Catalyst handles pushdown, column
pruning, partial aggregation, TakeOrderedAndProject, and broadcast joins;
at 100 TB the same plans shuffle only on group/join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.suite import query
from surrealdb_spark.suite._util import (
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dsum,
    sql_to_double,
    to_double,
)

# Shared expressions: 1 - l_discount / 1 + l_tax, exact at scale 4.
# (Built lazily — Column construction needs an active SparkContext.)


def _one_minus_disc():
    return (F.lit(1).cast("decimal(12,4)") - dec("l_discount")).cast("decimal(12,4)")


def _one_plus_tax():
    return (F.lit(1).cast("decimal(12,4)") + dec("l_tax")).cast("decimal(12,4)")


_SQL_OMD = "CAST(1 - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))"
_SQL_OPT = "CAST(1 + CAST(l_tax AS DECIMAL(12,4)) AS DECIMAL(12,4))"
_SQL_PRICE = "CAST(l_extendedprice AS DECIMAL(12,4))"

# ---------------------------------------------------------------------------
# q1 — pricing summary (groupBy + 8 aggregates). Flagship aggregate query.
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_to_double(f'SUM({_SQL_PRICE} * {_SQL_OMD})')} AS sum_disc_price,
           {sql_to_double(f'SUM({_SQL_PRICE} * {_SQL_OMD} * {_SQL_OPT})')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    # Decimal aggregation is CPU-heavy per byte; spread the map side when
    # the input layout caps scan parallelism (identity at scale — r12,
    # measured 1.32 s → 0.86 s at sf0.1).
    li = cat.spread(li, "lineitem", "l_orderkey")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            to_double(F.sum(dec("l_extendedprice") * _one_minus_disc())).alias(
                "sum_disc_price"
            ),
            to_double(
                F.sum(dec("l_extendedprice") * _one_minus_disc() * _one_plus_tax())
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority (3-way join + agg + deterministic top-k)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           {sql_to_double(f'SUM({_SQL_PRICE} * {_SQL_OMD})')} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    ords = cat.orders.filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = cat.lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    # Broadcast joins + decimal partial-agg all run in the scan stage;
    # spread it when the layout caps parallelism (identity at scale — r12,
    # measured 0.91 s → 0.75 s at sf0.1).
    li = cat.spread(li, "lineitem", "l_orderkey")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            to_double(F.sum(dec("l_extendedprice") * _one_minus_disc())).alias("revenue")
        )
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume (6-way join, broadcast dims)
# ---------------------------------------------------------------------------


@query(
    "q5_local_supplier",
    oracle=f"""
    SELECT n_name,
           {sql_to_double(f'SUM({_SQL_PRICE} * {_SQL_OMD})')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    bench=True,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    ords = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    region = cat.region.filter(F.col("r_name") == "ASIA")
    nation = cat.nation.join(
        F.broadcast(region), cat.nation.n_regionkey == region.r_regionkey
    )
    return (
        cat.lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(cat.customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            to_double(F.sum(dec("l_extendedprice") * _one_minus_disc())).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Scan / filter / project / sort / limit primitives
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_to_double(f'CAST(l_quantity AS DECIMAL(12,4)) * {_SQL_PRICE}')} AS gross,
           l_returnflag
    FROM lineitem
    WHERE l_discount > 0.05 AND l_quantity < 10 AND l_returnflag <> 'N'
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 10)
        & (F.col("l_returnflag") != "N")
    ).select(
        "l_orderkey",
        "l_linenumber",
        to_double(dec("l_quantity") * dec("l_extendedprice")).alias("gross"),
        "l_returnflag",
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ORDER BY + LIMIT → Catalyst TakeOrderedAndProject (reference SortTopK,
    # core/src/exec/operators/sort/topk.rs) — no full sort at scale.
    return (
        Catalog(spark, sf_dir)
        .orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@query("count_scan", oracle="SELECT COUNT(*) AS n FROM lineitem", hidden=True)
def count_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CountScan fast path — Spark answers from parquet row-group metadata.
    return Catalog(spark, sf_dir).lineitem.agg(F.count(F.lit(1)).alias("n"))


@query(
    "count_where",
    oracle="SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25",
hidden=True)
def count_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IndexCountScan analogue: predicate pushed to parquet scan, count-only.
    li = Catalog(spark, sf_dir).lineitem
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25)).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "group_all",
    oracle=f"""
    SELECT COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total,
           {sql_davg('o_totalprice')} AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
)
def group_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # GROUP ALL (single group, no keys): reference core/src/expr/group.rs:10.
    return Catalog(spark, sf_dir).orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
hidden=True)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).lineitem.select("l_returnflag", "l_linestatus").distinct()


@query(
    "union_sources",
    oracle="""
    SELECT 'customer' AS src, c_name AS name, c_acctbal AS acctbal FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_name AS name, s_acctbal AS acctbal FROM supplier
    """,
)
def union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-source FROM concat (reference Union, exec/operators/union.rs:19)
    # → unionByName; reference runs sources sequentially only for mutation
    # atomicity, which doesn't apply to batch reads.
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(
        F.lit("customer").alias("src"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = cat.supplier.select(
        F.lit("supplier").alias("src"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@query(
    "split_explode",
    oracle="""
    SELECT o_orderkey, UNNEST(string_split(o_orderpriority, '-')) AS token
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SPLIT ON field (reference core/src/exec/operators/split.rs:13) = explode.
    ords = Catalog(spark, sf_dir).orders.filter(F.col("o_orderstatus") == "F")
    return ords.select(
        "o_orderkey",
        F.explode(F.split(F.col("o_orderpriority"), "-")).alias("token"),
    )


# ---------------------------------------------------------------------------
# Window / time-bucket superset (reference has no window functions; §2.5)
# ---------------------------------------------------------------------------


@query(
    "window_latest_event",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    bench=True,
hidden=True)
def window_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dedup-rank: latest event per user. Orders on millisecond epoch so Spark
    # (µs timestamps) and DuckDB (ns) agree on ties.
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy(
        F.unix_millis(F.col("ts")).desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "time_bucket_daily",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n, {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
hidden=True)
def time_bucket_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time::group(ts, 'day') + GROUP BY ≈ tumbling window (core/src/fnc/time.rs).
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))


@query(
    "math_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS s1,
           {sql_to_double('SUM(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4)))')} AS s2,
           ({sql_to_double('SUM(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4)))')}
            - {sql_dsum('value')} * {sql_dsum('value')} / COUNT(*))
           / (COUNT(*) - 1) AS variance
    FROM events
    GROUP BY event_type
    """,
)
def math_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # math::variance/stddev (core/src/fnc/math.rs) with deterministic
    # exact-sum formulation (sum/sum-of-squares in decimal, FP only at the end).
    ev = Catalog(spark, sf_dir).events
    out = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("s1"),
        to_double(F.sum(dec("value") * dec("value"))).alias("s2"),
    )
    return out.select(
        "event_type",
        "n",
        "s1",
        "s2",
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "variance"
        ),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dynamic/schemaless field access: props is a JSON overflow column
    # (SURVEY §1.4 row for schemaless docs).
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object(F.col("props"), "$.k").cast("bigint")).alias("sum_k")
    )
