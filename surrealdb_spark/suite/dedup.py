"""Dedup suite: exact, Jaccard pairs, MinHash+LSH, SimHash — every tier of
the training-data dedup ladder, each verified against a SQL oracle that
reproduces the signatures bit-for-bit (md5-based hashing is portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.pipeline.dedup import (
    _HEX_HIGH,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
)
from surrealdb_spark.suite import query

_SQL_WORDS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SQL_FP = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"
_SQL_DW = f"""
    dw AS (
      SELECT DISTINCT doc_id AS doc, w FROM (
        SELECT doc_id, unnest({_SQL_WORDS}) AS w FROM documents)
    )
"""
_SQL_JACCARD_TAIL = """
    sizes AS (SELECT doc, COUNT(*) AS n FROM dw GROUP BY doc),
    inter AS (
      SELECT c.id1, c.id2, COUNT(*) AS cnt
      FROM cand c JOIN dw a ON a.doc = c.id1 JOIN dw b ON b.doc = c.id2 AND b.w = a.w
      GROUP BY c.id1, c.id2
    )
    SELECT id1, id2,
           CAST(cnt AS DOUBLE) / CAST(s1.n + s2.n - cnt AS DOUBLE) AS jaccard
    FROM inter JOIN sizes s1 ON s1.doc = id1 JOIN sizes s2 ON s2.doc = id2
    WHERE CAST(cnt AS DOUBLE) / CAST(s1.n + s2.n - cnt AS DOUBLE) >= 0.99
"""


@query(
    "dedup_exact",
    oracle=f"""
    SELECT {_SQL_FP} AS fp, MIN(doc_id) AS canonical, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact hash-groupBy dedup (canonical keep-min-id per fingerprint).
    return exact_dedup(Catalog(spark, sf_dir).documents, "doc_id", "text")


@query(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH {_SQL_DW},
    cand AS (
      SELECT a.doc AS id1, b.doc AS id2 FROM dw a JOIN dw b ON a.w = b.w AND a.doc < b.doc
      GROUP BY 1, 2
    ),
    {_SQL_JACCARD_TAIL}
    """,
hidden=True)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact word-set Jaccard near-dup pairs (n-gram Jaccard tier).
    # allow_quadratic: hidden tiny-SF oracle-verify scope, not a bench path.
    cat = Catalog(spark, sf_dir)
    return jaccard_pairs(cat.spread(cat.documents, "documents", "doc_id"),
                         "doc_id", "text", 0.99, allow_quadratic=True)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_DW},
    sig AS (
      SELECT doc, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || w)) AS mh
      FROM dw, (SELECT unnest(range(12)) AS seed) seeds
      GROUP BY doc, seed
    ),
    buckets AS (
      SELECT doc, seed // 3 AS band, string_agg(mh, ',' ORDER BY seed) AS bucket
      FROM sig GROUP BY doc, seed // 3
    ),
    cand AS (
      SELECT DISTINCT b1.doc AS id1, b2.doc AS id2
      FROM buckets b1 JOIN buckets b2
        ON b1.band = b2.band AND b1.bucket = b2.bucket AND b1.doc < b2.doc
    ),
    {_SQL_JACCARD_TAIL}
    """,
hidden=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MinHash (12 hashes) + LSH (4 bands × 3 rows) + exact-Jaccard verify:
    # the shuffle-on-(band,bucket) scale path — no full cross product.
    cat = Catalog(spark, sf_dir)
    return minhash_lsh_pairs(
        cat.spread(cat.documents, "documents", "doc_id"),
        "doc_id", "text", 0.99, n_hashes=12, bands=4
    )


def _simhash_oracle(n_planes: int = 32) -> str:
    high = ", ".join(f"'{h}'" for h in _HEX_HIGH)
    sums = ", ".join(
        f"SUM(CASE WHEN substring(md5(w), {j + 1}, 1) IN ({high}) THEN 1 ELSE -1 END) AS b{j}"
        for j in range(n_planes)
    )
    bits = " || ".join(f"CASE WHEN b{j} >= 0 THEN '1' ELSE '0' END" for j in range(n_planes))
    return f"""
    WITH {_SQL_DW},
    sums AS (SELECT doc, {sums} FROM dw GROUP BY doc)
    SELECT doc, {bits} AS simhash FROM sums
    """


@query("dedup_simhash", oracle=_simhash_oracle(), bench=True)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 32-plane SimHash fingerprints (hamming-space near-dup tier).  The
    # tokenize+md5+32-plane partial agg is CPU-heavy per input byte —
    # spread the map side when the input layout caps scan parallelism
    # (identity at scale — r12, measured 1.46 s → 1.26 s at sf0.1).
    cat = Catalog(spark, sf_dir)
    return simhash(cat.spread(cat.documents, "documents", "doc_id"),
                   "doc_id", "text")
