"""Event-stream product analytics: funnels, retention cohorts, and the
IVF-centroid build step over embeddings — all exact-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.suite import query


@query(
    "funnel_signup_click_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) AS t_signup,
             MIN(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                     AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
    FROM firsts
    """,
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ordered funnel: first-occurrence times per stage, each stage must
    # strictly follow the previous (conditional min + int counts — exact).
    ev = Catalog(spark, sf_dir).events.withColumn("tms", F.unix_millis("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("tms"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("tms"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("tms"))).alias("t_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)).alias("stage_signup"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull() & (F.col("t_click") > F.col("t_signup")), 1
            ).otherwise(0)
        ).alias("stage_click"),
        F.sum(
            F.when(
                F.col("t_signup").isNotNull()
                & (F.col("t_click") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("stage_purchase"),
    )


@query(
    "retention_day_over_day",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day,
           COUNT(*) AS active_users,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained_next_day
    FROM active a
    LEFT JOIN active b ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
    GROUP BY a.day
    """,
)
def retention_day_over_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Day-over-day retention: distinct active days per user; "active again
    # on day+1" read off the user's own sorted day sequence (int counts —
    # exact).  The self-join form computed the distinct subtree TWICE
    # (Spark does not share a subtree across join sides) and broadcast one
    # copy; on distinct (user, day) rows lead(day) == day+1 is exactly the
    # old join's match predicate, and the window reuses the distinct's
    # user-keyed exchange (r13, guide §2.4; output verified equal at
    # sf0.1/sf1, oracle green).
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    active = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    nxt = F.lead("day").over(W.partitionBy("user_id").orderBy("day"))
    flagged = active.withColumn(
        "__ret", (nxt == F.date_add("day", 1)).cast("int")
    )
    return (
        flagged.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.coalesce(F.col("__ret"), F.lit(0))).alias("retained_next_day"),
        )
    )


@query(
    "embedding_label_centroids",
    oracle="""
    SELECT label, pos,
           CAST(ROUND(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))), 9) AS DOUBLE)
             / COUNT(*) AS mean_component,
           COUNT(*) AS n
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    WHERE pos <= 8
    GROUP BY label, pos
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF build step: per-label centroids (first 8 dims as rows — row shape
    # keeps float parity exact: per-dimension DECIMAL(18,9) sums are
    # order-independent; the mean divides as double).
    emb = Catalog(spark, sf_dir).embeddings
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).withColumn("pos", F.col("pos0") + 1)
    return (
        exploded.filter(F.col("pos") <= 8)
        .groupBy("label", "pos")
        .agg(
            (
                F.round(F.sum(F.col("v").cast("double").cast("decimal(18,9)")), 9)
                .cast("double")
                / F.count(F.lit(1))
            ).alias("mean_component"),
            F.count(F.lit(1)).alias("n"),
        )
    )
