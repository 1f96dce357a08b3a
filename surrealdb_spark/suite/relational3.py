"""Third relational wave — TPC-H-shaped breadth: simple predicate revenue
(q6), EXISTS semi-join (q4), two-nation volume (q7), priority×status matrix
(q12), conditional-aggregate ratio (q14), distinct-count rollups (q16),
disjunctive predicate push (q19).  All exact-decimal deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.suite import query
from surrealdb_spark.suite._util import dec, sql_to_double, to_double

_OMD = "CAST(1 - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,4))"


def _one_minus_disc():
    return (F.lit(1).cast("decimal(12,4)") - dec("l_discount")).cast("decimal(12,4)")


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_to_double(f"SUM({_PRICE} * CAST(l_discount AS DECIMAL(12,4)))")} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    bench=True,
hidden=True)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q6: pure pushdown-scan aggregate — the filter triple reaches parquet.
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            to_double(F.sum(dec("l_extendedprice") * dec("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q4: EXISTS correlated subquery → left_semi join (SURVEY §2.3).
    cat = Catalog(spark, sf_dir)
    ords = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    # merge hint (r13, guide §3.1): a LeftSemi BHJ can only build the
    # RIGHT side, i.e. the corpus-sized lineitem projection — whose size
    # estimate (compressed parquet bytes of 2 pruned columns) lands under
    # the broadcast threshold while the actual hash relation is 6M+ rows
    # rebuilt every run.  Sort-merge streams both sides and won at sf1
    # (3.6→1.2 s) AND sf0.1 (0.55→0.43 s); at real scale the estimates
    # exceed the threshold and the planner picks SMJ anyway — the hint
    # makes the safe choice explicit instead of estimate-dependent.
    late = cat.lineitem.select("l_orderkey", "l_shipdate").hint("merge")
    return (
        ords.join(
            late,
            (ords.o_orderkey == late.l_orderkey) & (late.l_shipdate > ords.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS yr,
           {sql_to_double(f"SUM({_PRICE} * {_OMD})")} AS volume
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        cat.lineitem.join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cat.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cat.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(to_double(F.sum(dec("l_extendedprice") * _one_minus_disc())).alias("volume"))
    )


@query(
    "q12_priority_matrix",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q12 shape: conditional integer counts by category.
    cat = Catalog(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # merge hint (r13): same estimate trap as q4 — the orders side's
    # 2-column pruned-scan estimate stays under the broadcast threshold
    # while the actual corpus-sized hash relation is rebuilt per run;
    # interleaved A/B sf1 1.22→0.70 s, sf0.1 0.43→0.40 s (guide §3.1)
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(cat.orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "q14_promo_ratio",
    oracle=f"""
    SELECT {sql_to_double(f"SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_PRICE} * {_OMD} ELSE CAST(0 AS DECIMAL(12,4)) END)")}
           / {sql_to_double(f"SUM({_PRICE} * {_OMD})")} * 100.0e0 AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
hidden=True)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q14: conditional-aggregate ratio; both sums exact-decimal before the
    # single double division.
    cat = Catalog(spark, sf_dir)
    rev = dec("l_extendedprice") * _one_minus_disc()
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    return (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (to_double(F.sum(promo)) / to_double(F.sum(rev)) * F.lit(100.0)).alias(
                "promo_share"
            )
        )
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20)
    GROUP BY p_brand, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q16 shape: COUNT(DISTINCT) per group — exact, two-phase under AQE.
    cat = Catalog(spark, sf_dir)
    parts = cat.part.filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        cat.lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q19_disjunctive",
    oracle=f"""
    SELECT {sql_to_double(f"SUM({_PRICE} * {_OMD})")} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5 AND l_quantity <= 25)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
    """,
hidden=True)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    # q19: disjunctive multi-table predicate (OR of conjunction branches) —
    # the UnionIndexScan case (scan/union_index.rs), handled by one filter.
    cat = Catalog(spark, sf_dir)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            to_double(F.sum(dec("l_extendedprice") * _one_minus_disc())).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )
