"""Second relational/graph/search wave: +path recursion, search highlight,
seeded deterministic shuffle, q10/q18-style join-aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.operators.fulltext import highlight, match_offsets
from surrealdb_spark.operators.graph import record_id, recurse_paths
from surrealdb_spark.suite import query
from surrealdb_spark.suite._util import dec, sql_to_double, to_double


@query(
    "graph_recurse_paths",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT concat('customer:', CAST(c_custkey AS VARCHAR)) AS start,
             c_custkey AS k,
             concat('customer:', CAST(c_custkey AS VARCHAR)) AS path,
             0 AS depth
      FROM customer WHERE c_custkey % 97 = 0
      UNION ALL
      SELECT start, k // 2,
             path || '->' || concat('customer:', CAST(k // 2 AS VARCHAR)),
             depth + 1
      FROM p WHERE depth < 4 AND k >= 2
    )
    SELECT start, concat('customer:', CAST(k AS VARCHAR)) AS node, depth, path
    FROM p WHERE depth >= 1
    """,
hidden=True)
def graph_recurse_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # @{1..4}+path (recursion.rs path instruction): every path collected.
    from surrealdb_spark.suite.graph import _reports_to

    cat = Catalog(spark, sf_dir)
    start = cat.customer.filter(F.col("c_custkey") % 97 == 0).select(
        record_id("customer", "c_custkey").alias("id")
    )
    return recurse_paths(start, _reports_to(cat), min_depth=1, max_depth=4)


_HL_TERMS = ["spark", "join"]


@query(
    "search_highlight",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(text, '\b(spark|join)\b', '<em>\1</em>', 'g') AS highlighted,
           CAST(len(regexp_extract_all(text, '\b(spark|join)\b')) AS INT) AS n_matches
    FROM documents WHERE doc_id % 10 = 0
    """,
hidden=True)
def search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    # search::highlight + match count (fnc/search.rs, ft/highlighter.rs).
    docs = Catalog(spark, sf_dir).documents.filter(F.col("doc_id") % 10 == 0)
    first, n = match_offsets("text", _HL_TERMS)
    return docs.select(
        "doc_id",
        highlight("text", _HL_TERMS).alias("highlighted"),
        n.alias("n_matches"),
    )


@query(
    "random_shuffle_seeded",
    oracle="""
    SELECT o_orderkey FROM orders
    ORDER BY md5(concat('42:', CAST(o_orderkey AS VARCHAR))), o_orderkey
    LIMIT 20
    """,
)
def random_shuffle_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RandomShuffle (ORDER BY RAND, sort/shuffle.rs:32) made reproducible:
    # seeded md5 sort key — the deterministic variant an oracle can check
    # (true rand(seed) differs across engines by construction).
    ords = Catalog(spark, sf_dir).orders
    key = F.md5(F.concat(F.lit("42:"), F.col("o_orderkey").cast("string")))
    return ords.orderBy(key.asc(), F.col("o_orderkey").asc()).limit(20).select("o_orderkey")


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_to_double("SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(12,4)))")} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    one_minus = (F.lit(1).cast("decimal(12,4)") - dec("l_discount")).cast("decimal(12,4)")
    ords = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = cat.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(to_double(F.sum(dec("l_extendedprice") * one_minus)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           {sql_to_double("SUM(CAST(l_quantity AS DECIMAL(12,4)))")} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 150
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HAVING on an exact-decimal aggregate → deterministic membership.
    cat = Catalog(spark, sf_dir)
    # spread: the order-grained decimal partial agg (~|orders| groups) is
    # the heavy map work (identity at scale — r12, 2.53 s → 1.02 s A/B)
    li = cat.spread(cat.lineitem, "lineitem", "l_orderkey")
    return (
        li.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(F.sum(dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "orderdate",
            "o_totalprice",
            to_double(F.col("__qty")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )
