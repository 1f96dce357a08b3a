"""Similarity search over embedding columns.

Two tiers (SURVEY.md §7 step 10):
  * ``cosine_topk`` — exact brute-force top-k (operators/knn.knn_join):
    correct baseline, O(|Q|·|C|) scoring.
  * ``srp_lsh_topk`` — approximate: sign-random-projection (SimHash-for-
    cosine) signatures, banded bucketing, exact re-score inside candidate
    buckets.  At 100 TB the bucket join replaces the full cross product:
    shuffle is |rows|·bands keyed by (band, bits), and each bucket is tiny.

Plane matrix is derived from md5 — deterministic across runs/engines, no
RNG state.  The reference's HNSW (core/src/idx/trees/hnsw/) is an in-memory
graph index that doesn't map to Spark's execution model; banded LSH is the
idiomatic distributed equivalent (same role: prune before exact scoring).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from surrealdb_spark.functions import vector as V
from surrealdb_spark.operators.knn import knn_join


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int, exclude_self: bool = False
) -> DataFrame:
    """Exact brute-force cosine top-k (the correctness baseline)."""
    return knn_join(
        queries,
        corpus,
        k,
        metric="cosine",
        q_id="vec_id",
        q_vec="embedding",
        c_id="vec_id",
        c_vec="embedding",
        exclude_self=exclude_self,
    )


def srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: sign of md5("p:d")'s top hex bit."""
    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_signature(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Bit-string signature: one sign bit per hyperplane.

    One nested HOF over a single 2-D plane literal (not one fold-expression
    per plane): 16 separate aggregate trees made Catalyst analysis the
    dominant cost — measured ~8 s fixed overhead at ANY scale factor.
    """
    planes_lit = F.array(
        *[F.array(*[F.lit(w) for w in plane]) for plane in planes]
    )
    bits = F.transform(
        planes_lit,
        lambda plane: F.when(
            V.fold_sum(
                F.zip_with(F.col(vec_col), plane, lambda x, w: x.cast("double") * w)
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: banded SRP-LSH candidates + exact re-score.

    A pair is a candidate if ANY band (n_planes//bands consecutive signature
    bits) matches — the classic banding trade-off: more bands = higher
    recall, bigger buckets.  Returns (q_id, c_id, dist, rank); may return
    fewer than k per query (approximate).
    """
    planes = srp_planes(n_planes, dim)
    rows = n_planes // bands

    def with_bands(df: DataFrame, id_alias: str) -> DataFrame:
        sig = srp_signature("embedding", planes)
        return (
            df.select(F.col("vec_id").alias(id_alias), "embedding", sig.alias("__sig"))
            .select(
                id_alias,
                "embedding",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.substring("__sig", b * rows + 1, rows).alias("bits"),
                            )
                            for b in range(bands)
                        ]
                    )
                ).alias("__b"),
            )
            .select(id_alias, "embedding", "__b.band", "__b.bits")
        )

    q = with_bands(queries, "q_id").withColumnRenamed("embedding", "__qv")
    c = with_bands(corpus, "c_id").withColumnRenamed("embedding", "__cv")
    cand = (
        q.join(c, ["band", "bits"])
        .select("q_id", "c_id", "__qv", "__cv")
        .dropDuplicates(["q_id", "c_id"])
    )
    if exclude_self:
        cand = cand.filter(F.col("q_id") != F.col("c_id"))
    scored = cand.select(
        "q_id", "c_id", V.cosine_distance("__qv", "__cv").alias("dist")
    )
    from pyspark.sql import Window as W

    top = W.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(top)).filter(F.col("rank") <= k)
