"""Time-series / OLAP superset suite: as-of join, sessionization, rollup,
hybrid rank fusion (search::rrf).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.operators.asof import asof_join, sessionize
from surrealdb_spark.operators.fulltext import rrf_fuse
from surrealdb_spark.suite import query
from surrealdb_spark.suite._util import sql_bm25


@query(
    "asof_purchase_attribution",
    oracle="""
    WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events
               WHERE event_type = 'click'),
    r AS (SELECT user_id, epoch_ms(ts) AS tms, MAX(event_id) AS purchase_id
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT l.event_id, l.user_id, r.purchase_id AS purchase_id_asof
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tms >= r.tms
    """,
    bench=True,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Backward as-of join: each click gets the user's most recent prior (or
    # simultaneous) purchase.  Millisecond keys so Spark(µs)/DuckDB(ns) agree.
    # Simultaneous-purchase dedup (max event_id per (user, tms)) rides the
    # window's tiebreak order instead of a separate groupBy — same winner,
    # one Exchange less (r12; oracle unchanged, results bit-identical).
    ev = Catalog(spark, sf_dir).events.withColumn("tms", F.unix_millis("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "tms")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "tms", F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        clicks, purchases, ["user_id"], "tms", "tms", ["purchase_id"],
        right_tiebreak=["purchase_id"],
    )
    return out.select("event_id", "user_id", "purchase_id_asof")


@query(
    "sessionize_events",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
    m AS (SELECT user_id, event_id, tms,
            CASE WHEN lag(tms) OVER w IS NULL
                   OR tms - lag(tms) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
    s AS (SELECT user_id, tms,
            CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY tms, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
          FROM m)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(tms) AS start_ms, MAX(tms) AS end_ms
    FROM s GROUP BY user_id, session_id
    """,
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sessionization: 30-minute inactivity gap → new session (lag + running
    # sum of boundary flags; SURVEY §2.5 superset pattern).
    ev = Catalog(spark, sf_dir).events.withColumn("tms", F.unix_millis("ts"))
    s = sessionize(ev, "user_id", "tms", F.lit(30 * 60 * 1000), order_tiebreak=["event_id"])
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("tms").alias("start_ms"),
        F.max("tms").alias("end_ms"),
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hierarchical ROLLUP (absent in the reference, free in Spark —
    # SURVEY §2.4 grouping-sets row; exact int aggregates only).
    ords = Catalog(spark, sf_dir).orders
    return ords.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("key_sum")
    )


_TERMS_A = ["spark", "join", "filter"]
_TERMS_B = ["customer", "order", "line"]


@query(
    "search_rrf_fusion",
    oracle=f"""
    WITH a AS ({sql_bm25(_TERMS_A, 30)}),
         b AS ({sql_bm25(_TERMS_B, 30)})
    SELECT COALESCE(a.doc, b.doc) AS doc,
           COALESCE(1.0e0 / (60 + a.rank), 0.0e0)
             + COALESCE(1.0e0 / (60 + b.rank), 0.0e0) AS rrf
    FROM a FULL JOIN b ON a.doc = b.doc
    ORDER BY rrf DESC, doc LIMIT 15
    """,
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # search::rrf hybrid fusion (core/src/fnc/search.rs) of two BM25 runs.
    from surrealdb_spark.suite._util import ft_index

    idx = ft_index(spark, sf_dir)
    a = idx.search(_TERMS_A, k=30)
    b = idx.search(_TERMS_B, k=30)
    return (
        rrf_fuse([a, b], k=60)
        .orderBy(F.desc("rrf"), F.asc("doc"))
        .limit(15)
    )


@query(
    "decimal_arithmetic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4)
           AS DOUBLE) AS sum_gross,
      CAST(ROUND(SUM(CAST(l_linenumber AS DECIMAL(18,4)) + CAST(l_discount AS DECIMAL(18,4))), 4)
           AS DOUBLE) AS sum_line_disc,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE)
        / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS gross_ratio,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def decimal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Declared-decimal Number parity (types/src/value/number.rs:19-26,
    # promotion core/src/fnc/operate.rs): money columns as user-facing
    # DECIMAL fields — exact decimal sum / product / int⊕decimal promotion,
    # re-quantized to scale 4 and cast to DOUBLE only at the end (sums and
    # products carry full decimal precision through the aggregation).
    cat = Catalog(spark, sf_dir)
    # decimal-heavy map side; spread when layout caps scan parallelism
    # (identity at scale — r12, same rationale as q1)
    li = cat.spread(cat.lineitem, "lineitem", "l_orderkey")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    line = F.col("l_linenumber").cast("decimal(18,4)")
    gross = price * (F.lit(1).cast("decimal(18,4)") - disc)

    def out4(c: F.Column) -> F.Column:
        return F.round(c, 4).cast("double")

    sum_price_d = out4(F.sum(price))
    sum_gross_d = out4(F.sum(gross))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            out4(F.sum(qty)).alias("sum_qty"),
            sum_price_d.alias("sum_price"),
            sum_gross_d.alias("sum_gross"),
            out4(F.sum(line + disc)).alias("sum_line_disc"),
            (sum_price_d / F.count(F.lit(1))).alias("avg_price"),
            (sum_gross_d / sum_price_d).alias("gross_ratio"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
