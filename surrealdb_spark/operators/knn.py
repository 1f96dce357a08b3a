"""KNN: brute-force k-nearest-neighbor top-k (the `<|k,ef|>` operator).

Reference: KnnScan over an HNSW index (core/src/exec/operators/scan/knn.rs:37)
and brute-force KnnTopK (core/src/exec/operators/knn_topk.rs:81); distance
kinds from core/src/fnc/vector.rs.  The HNSW *structure* is not ported —
on Spark the scale path is scan + local top-k (below) or LSH bucketing
(surrealdb_spark.pipeline.similarity); `ef` is accepted-but-advisory.

Plan shape:
  1. broadcast the (small) query set; nested-loop join against the corpus —
     corpus rows never shuffle for the join;
  2. one per-query row_number window with rank <= k: Spark's
     WindowGroupLimit rewrite (rank-limit pushdown) inserts a PARTIAL
     group-limit before the exchange, so each map partition forwards at
     most k rows per query — the partition-local top-k the old hand-rolled
     salted window computed, but without its extra Exchange+Sort (the
     (spark_partition_id, q_id) window itself required a shuffle, doubling
     the exchanges; r12 optimization, guide §2.4).
At 100 TB the win comes from pruning candidates BEFORE scoring — LSH
bucketing in surrealdb_spark.pipeline.similarity — with this operator as
the exact re-scorer inside each bucket.

Ordering is deterministic: (distance, neighbor id) — distances are
bit-stable (sequential double folds, functions/vector.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from surrealdb_spark.functions import vector as V


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    metric: str = "cosine",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """For each query row, the k nearest corpus rows → (q_id, c_id, dist, rank)."""
    if metric == "cosine":
        # Hoist each side's magnitude out of the pair expression (r13, the
        # same split cosine_pairs got in r12): cosine_distance evaluates
        # THREE aggregate(zip_with(...)) folds per pair — dot(q,c) plus both
        # self-dots — each materializing a transient array per evaluation.
        # sqrt(dot(a,a)) is a pure function of the row, so computing it once
        # per side and writing the pair term as 1.0 − dot/(|q|·|c|) keeps
        # every rounding point of V.cosine_distance (same fold, same sqrt,
        # same multiply/divide/subtract order → bit-identical dist; verified
        # by full 100k-dist old-vs-new diff).  2 of 3 folds gone from the
        # O(|Q|·|C|) stage: knn_cosine sf1 warm 1.8 → 0.7 s.
        q = F.broadcast(queries.select(
            F.col(q_id).alias("q_id"), F.col(q_vec).alias("__qv"),
            V.magnitude(q_vec).alias("__qm"),
        ))
        c = corpus.select(
            F.col(c_id).alias("c_id"), F.col(c_vec).alias("__cv"),
            V.magnitude(c_vec).alias("__cm"),
        )
        pair_dist = F.lit(1.0) - V.dot("__qv", "__cv") / (
            F.col("__qm") * F.col("__cm")
        )
    else:
        dist_fn = V.METRICS[metric]
        q = F.broadcast(queries.select(F.col(q_id).alias("q_id"), F.col(q_vec).alias("__qv")))
        c = corpus.select(F.col(c_id).alias("c_id"), F.col(c_vec).alias("__cv"))
        pair_dist = dist_fn("__qv", "__cv")
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.select("q_id", "c_id", pair_dist.alias("dist"))
    order = [F.col("dist").asc(), F.col("c_id").asc()]
    top = W.partitionBy("q_id").orderBy(*order)
    # Relies on Spark >= 3.5's WindowGroupLimit rank-limit pushdown (the
    # rank <= k filter becomes a partial per-map-partition top-k BEFORE the
    # exchange — plans/r12/knn_cosine_after.txt).  On an older Spark, or
    # with spark.sql.optimizer.windowGroupLimitThreshold set to -1, the
    # full scored cross product would shuffle into per-query partitions;
    # if that rewrite ever disappears, restore the hand-rolled salted
    # partition-local top-k this replaced (r12 history of this file).
    return (
        scored.withColumn("rank", F.row_number().over(top))
        .filter(F.col("rank") <= k)
    )
