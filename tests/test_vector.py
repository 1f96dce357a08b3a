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


def test_ivf_recall_and_shape(spark, sf_dir):
    from surrealdb_spark.pipeline.ivf import ivf_build

    emb = Catalog(spark, sf_dir).embeddings
    idx = ivf_build(emb, n_cells=8, iters=2)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(q, emb, 10, exclude_self=True)
    approx = idx.search(None, k=10, nprobe=3,
                        query_pred=F.col("vec_id") % 50 == 0,
                        exclude_self=True)
    exact_pairs = {(r.q_id, r.c_id) for r in exact.collect()}
    rows = approx.collect()
    approx_pairs = {(r.q_id, r.c_id) for r in rows}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # nprobe=3 of 8 cells scans ~3/8 of the corpus; near-random synthetic
    # embeddings make cells weakly separated — assert clearly above the
    # floor and well-formed output.
    assert recall >= 0.3, f"IVF recall {recall:.2f} below floor"
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in per_q.items():
        dists = [r.dist for r in sorted(rs, key=lambda r: r.rank)]
        assert dists == sorted(dists) and len(rs) <= 10


def test_ivf_nprobe_full_equals_exact(spark, sf_dir):
    from surrealdb_spark.pipeline.ivf import ivf_build

    emb = Catalog(spark, sf_dir).embeddings
    idx = ivf_build(emb, n_cells=4, iters=1)
    exact = cosine_topk(emb.filter(F.col("vec_id") == 0), emb, 5,
                        exclude_self=True)
    # probing every cell degenerates to brute force → identical top-k
    full = idx.search(None, k=5, nprobe=4,
                      query_pred=F.col("vec_id") == 0, exclude_self=True)
    assert [(r.q_id, r.c_id) for r in exact.collect()] == \
        [(r.q_id, r.c_id) for r in full.collect()]


def test_srp_geometry_rule():
    """Band bits scale with corpus size (the round-2/3 gap: fixed 4-bit
    bands collapse to N/16 buckets at 100 TB)."""
    from surrealdb_spark.pipeline.similarity import srp_geometry

    n16, b = srp_geometry(500)        # test-scale corpus
    assert (n16, b) == (4 * 5, 4)     # ceil(log2(500/16)) = 5 bits
    n_big, _ = srp_geometry(10_000_000_000)   # 100 TB-class corpus
    assert n_big // 4 >= 29           # ~30-bit bands → bounded buckets
    assert srp_geometry(10)[0] == 16  # floor: never below 4 bits


def test_srp_bucket_sizes_bounded(spark, sf_dir):
    """With size-derived geometry the (band, bits) buckets stay near the
    target population — no degenerate N/16 collision groups."""
    from surrealdb_spark.pipeline.similarity import (
        srp_geometry,
        srp_planes,
        srp_sign,
        _banded,
    )

    emb = Catalog(spark, sf_dir).embeddings
    n = emb.count()
    n_planes, bands = srp_geometry(n)
    rows = n_planes // bands
    signed = srp_sign(emb, srp_planes(n_planes, 64))
    buckets = (
        _banded(signed, "id", "v", "s", bands, rows)
        .groupBy("band", "bits").count().collect()
    )
    biggest = max(r["count"] for r in buckets)
    # expected ≈ 16 per bucket; allow generous skew for random signatures
    assert biggest <= max(8 * 16, n // 4), f"degenerate bucket: {biggest}"


def test_cosine_pairs_bitwise_matches_sql_fold(spark, sf_dir):
    """The r13 Arrow-batched cosine_pairs must be BIT-identical to the SQL
    left-fold expression it replaced (same rounded multiply/add sequence,
    same division points) — pair set AND sim doubles."""
    import struct

    from surrealdb_spark.functions import vector as V
    from surrealdb_spark.pipeline.similarity import cosine_pairs

    emb = Catalog(spark, sf_dir).embeddings.limit(300)
    got = {
        (r.id1, r.id2): struct.pack("<d", r.sim)
        for r in cosine_pairs(
            emb, "vec_id", "embedding", 0.35, allow_quadratic=True
        ).collect()
    }
    e1 = emb.select(
        F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"),
        V.magnitude("embedding").alias("m1"),
    )
    e2 = emb.select(
        F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"),
        V.magnitude("embedding").alias("m2"),
    )
    ref = {
        (r.id1, r.id2): struct.pack("<d", r.sim)
        for r in e1.join(e2, F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2",
            (V.dot("v1", "v2") / (F.col("m1") * F.col("m2"))).alias("sim"),
        )
        .filter(F.col("sim") > 0.35)
        .collect()
    }
    assert got == ref and len(got) > 0
