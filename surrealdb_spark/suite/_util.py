"""Shared helpers for oracle-parity-safe expressions.

Float aggregation is order-dependent; Spark and DuckDB will not hash-match
on a naive SUM(double) over 60k rows.  The fix: cast inputs to DECIMAL
(exact, no ties possible when converting binary doubles to decimal scales —
a tie point k+0.5 at scale s has a factor 5^(s+1) in its reduced denominator
so no double equals it), do exact decimal arithmetic, cast the final result
to DOUBLE.  Both engines then produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(12,4) fits all money-ish columns in the TPC-H-ish testdata
# (|x| < 1e8) and three-way products stay within both engines' 38-digit cap.
MONEY = "decimal(12,4)"
# Final results are re-quantized to scale 4 (via ROUND, which is HALF_UP in
# both engines — decimal→decimal CAST downscaling is NOT consistent in
# DuckDB) before the double cast: DuckDB converts decimal→double as
# (double)unscaled / (double)10^scale (two roundings), which diverges from
# Spark's correctly-rounded BigDecimal cast when the unscaled value exceeds
# 2^53.  At scale 4 the unscaled magnitude stays < 2^53 for sums up to
# ~9e11, so both engines round identically.


def dec(col: Column | str) -> Column:
    """Exact decimal view of a double column (scale 4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def to_double(col: Column) -> Column:
    """Parity-safe decimal→double: HALF_UP-round to scale 4 first."""
    return F.round(col, 4).cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles: decimal-sum, cast back to double."""
    return to_double(F.sum(dec(col)))


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return to_double(F.sum(dec(c))) / F.count(c)


def sql_to_double(expr: str) -> str:
    return f"CAST(ROUND({expr}, 4) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    return sql_to_double(f"SUM(CAST({expr} AS DECIMAL(12,4)))")


def sql_davg(expr: str) -> str:
    return f"{sql_dsum(expr)} / COUNT({expr})"


SQL_WORDS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def sql_bm25(terms: list[str], limit: int) -> str:
    """DuckDB mirror of operators.fulltext.bm25_search over ``documents``
    (shared by the bm25 and fusion oracles) — identical expression tree to
    the Spark side so scores are bit-deterministic."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    per_term = []
    for i, t in enumerate(terms):
        per_term.append(
            f"SUM(CASE WHEN term = '{t}' THEN ln(1 + (N - df + 0.5e0)/(df + 0.5e0))"
            f" * tf * (1.2e0 + 1.0e0) / (tf + 1.2e0 * ((1.0e0 - 0.75e0) + 0.75e0 * dl / (sdl / N)))"
            f" ELSE 0.0e0 END) AS s{i}"
        )
    sums = ", ".join(per_term)
    total = " + ".join(f"s{i}" for i in range(len(terms)))
    return f"""
    WITH w AS (SELECT doc_id AS doc, {SQL_WORDS} AS ws FROM documents),
    dl AS (SELECT doc, len(ws) AS dl FROM w),
    tf AS (SELECT doc, term, COUNT(*) AS tf
           FROM (SELECT doc, unnest(ws) AS term FROM w)
           WHERE term IN ({terms_sql}) GROUP BY doc, term),
    stats AS (SELECT COUNT(*) AS N, SUM(dl) AS sdl FROM dl),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    agg AS (
      SELECT tf.doc, {sums}
      FROM tf JOIN dl USING (doc) JOIN dfreq USING (term) CROSS JOIN stats
      GROUP BY tf.doc
    )
    SELECT doc, score, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT) AS rank
    FROM (SELECT doc, {total} AS score FROM agg) WHERE score > 0
    ORDER BY score DESC, doc LIMIT {limit}
    """


# ---------------------------------------------------------------------------
# Shared fulltext index: DEFINE INDEX ... FULLTEXT semantics — the inverted
# index is built once per (session, corpus) and shared by every search in
# the suite (bm25_search, search_rrf_fusion), exactly like the reference's
# materialized index (core/src/catalog/schema/index.rs FullText kind).
# ---------------------------------------------------------------------------
_FT_CACHE: dict = {}


def ft_index(spark, sf_dir: str):
    """Build-once FulltextIndex over documents(doc_id, text)."""
    from surrealdb_spark.catalog import Catalog
    from surrealdb_spark.operators.fulltext import FulltextIndex

    ent = _FT_CACHE.get(sf_dir)
    if ent is None or ent[0] is not spark:
        ent = (spark, FulltextIndex(Catalog(spark, sf_dir).documents, "doc_id", "text"))
        _FT_CACHE[sf_dir] = ent
    return ent[1]


_SRP_CACHE: dict = {}


def srp_signed(spark, sf_dir: str, n_planes: int | None = None, dim: int = 64):
    """Build-once SRP-signed embeddings (DEFINE INDEX ... HNSW analogue:
    signatures are an index artifact, built at DDL time, searched many).
    ``n_planes=None`` derives the band geometry from the corpus size
    (similarity.srp_geometry scaling rule)."""
    from surrealdb_spark.catalog import Catalog
    from surrealdb_spark.pipeline.similarity import (
        srp_geometry,
        srp_planes,
        srp_sign,
    )

    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    if n_planes is None:
        n_planes, _ = srp_geometry(cat.rowcount("embeddings"))
    key = (sf_dir, n_planes, dim)
    ent = _SRP_CACHE.get(key)
    if ent is None or ent[0] is not spark:
        planes = srp_planes(n_planes, dim)
        ent = (spark, srp_sign(emb, planes))
        _SRP_CACHE[key] = ent
    return ent[1]
