"""Vector/KNN behavior tests beyond oracle parity: LSH recall quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.pipeline.similarity import cosine_topk, srp_lsh_topk


def test_srp_lsh_recall(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(q, emb, 10, exclude_self=True)
    approx = srp_lsh_topk(q, emb, 10, dim=64, n_planes=16, bands=4, exclude_self=True)
    exact_pairs = {(r.q_id, r.c_id) for r in exact.collect()}
    approx_pairs = {(r.q_id, r.c_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # Random synthetic embeddings: banding recall is modest by design;
    # assert it's meaningfully above chance (candidate rate ~ a few %).
    assert recall >= 0.2, f"LSH recall {recall:.2f} below floor"


def test_lsh_is_subset_of_scored_universe(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id") == 0)
    out = srp_lsh_topk(q, emb, 5, dim=64, exclude_self=True).collect()
    assert all(r.q_id == 0 and r.c_id != 0 for r in out)
    dists = [r.dist for r in out]
    assert dists == sorted(dists)
