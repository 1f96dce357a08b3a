"""Text-analysis suite: tokenization, lang-ID, quality, fingerprints,
n-gram mining, BM25 full-text search.

SQL-side tokenization mirrors pipeline.text.words exactly:
``list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.pipeline import text as T
from surrealdb_spark.suite import query

_SQL_WORDS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SQL_FP = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"


def _sql_markers(markers: list[str]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_SQL_WORDS}, x -> x IN ({lst})))"


@query(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_SQL_WORDS}) AS n_tokens,
           len(list_distinct({_SQL_WORDS})) AS n_distinct,
           {_SQL_FP} AS fp
    FROM documents
    """,
hidden=True)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token counting + document fingerprinting (rolling-hash analogue → md5
    # of the normalized text; string::words core/src/fnc/string.rs).
    cat = Catalog(spark, sf_dir)
    # spread: regex tokenize + fingerprint per row is CPU-heavy per byte and
    # otherwise runs on the scan's single row-group task (r13)
    docs = cat.spread(cat.documents, "documents", "doc_id")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.size(T.distinct_words("text")).alias("n_distinct"),
        T.fingerprint("text").alias("fp"),
    )


def _lang_case_sql() -> str:
    langs = list(T.LANG_MARKERS)
    hit = {lang: _sql_markers(m) for lang, m in T.LANG_MARKERS.items()}
    expr = f"'{langs[-1]}'"
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        conds = " AND ".join(f"{hit[lang]} >= {hit[other]}" for other in langs[i + 1 :])
        expr = f"CASE WHEN {conds} THEN '{lang}' ELSE {expr} END"
    return expr


@query(
    "lang_id_heuristic",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           {_lang_case_sql()} AS predicted_lang,
           {_sql_markers(T.LANG_MARKERS['en'])} AS en_hits,
           {_sql_markers(T.LANG_MARKERS['zh'])} AS zh_hits
    FROM documents
    """,
hidden=True)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Language-ID via marker-token hit counts + deterministic argmax.
    cat = Catalog(spark, sf_dir)
    docs = cat.spread(cat.documents, "documents", "doc_id")  # r13, as token_stats
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_id("text").alias("predicted_lang"),
        T.lang_hit_count("text", T.LANG_MARKERS["en"]).alias("en_hits"),
        T.lang_hit_count("text", T.LANG_MARKERS["zh"]).alias("zh_hits"),
    )


_SQL_STOP = ", ".join(f"'{s}'" for s in T.STOPWORDS)


@query(
    "quality_scores",
    oracle=f"""
    SELECT doc_id, n_words, n_chars,
           sum_wl / n_words AS avg_word_len,
           stop_hits / n_words AS stopword_ratio,
           least(n_words / 80.0e0, 1.0e0) * 0.4e0
             + least((sum_wl / n_words) / 6.0e0, 1.0e0) * 0.3e0
             + (1.0e0 - stop_hits / n_words) * 0.3e0 AS quality
    FROM (
      SELECT doc_id,
             CAST(len({_SQL_WORDS}) AS DOUBLE) AS n_words,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(list_sum(list_transform({_SQL_WORDS}, x -> length(x))) AS DOUBLE) AS sum_wl,
             CAST(len(list_filter({_SQL_WORDS}, x -> x IN ({_SQL_STOP}))) AS DOUBLE) AS stop_hits
      FROM documents
    )
    """,
hidden=True)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality scoring: length/stopword/word-shape features, fixed double tree.
    cat = Catalog(spark, sf_dir)
    docs = cat.spread(cat.documents, "documents", "doc_id")  # r13, as token_stats
    f = T.quality_features("text")
    return docs.select(
        "doc_id",
        f["n_words"].alias("n_words"),
        f["n_chars"].alias("n_chars"),
        f["avg_word_len"].alias("avg_word_len"),
        f["stopword_ratio"].alias("stopword_ratio"),
        T.quality_score("text").alias("quality"),
    )


@query(
    "bigram_topk",
    oracle=f"""
    SELECT bigram, COUNT(*) AS n FROM (
      SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                    i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM (SELECT {_SQL_WORDS} AS w FROM documents)
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus n-gram mining: explode 2-shingles, count, deterministic top-k.
    # spread: shingle construction is CPU-heavy per byte (identity at scale)
    cat = Catalog(spark, sf_dir)
    docs = cat.spread(cat.documents, "documents", "doc_id")
    return (
        docs.select(F.explode(T.shingles("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


_BM25_TERMS = ["spark", "join", "filter"]


def _bm25_oracle() -> str:
    terms_sql = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    per_term = []
    for i, t in enumerate(_BM25_TERMS):
        per_term.append(
            f"SUM(CASE WHEN term = '{t}' THEN ln(1 + (N - df + 0.5e0)/(df + 0.5e0))"
            f" * tf * (1.2e0 + 1.0e0) / (tf + 1.2e0 * ((1.0e0 - 0.75e0) + 0.75e0 * dl / (sdl / N)))"
            f" ELSE 0.0e0 END) AS s{i}"
        )
    sums = ", ".join(per_term)
    total = " + ".join(f"s{i}" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH w AS (SELECT doc_id AS doc, {_SQL_WORDS} AS ws FROM documents),
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
    ORDER BY score DESC, doc LIMIT 10
    """


@query("bm25_scores", oracle=_bm25_oracle(), hidden=True)
def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # `text @@ 'spark join filter'` MATCHES + BM25 ranking
    # (scan/fulltext.rs:46, idx/ft/fulltext.rs).
    from surrealdb_spark.suite._util import ft_index

    return ft_index(spark, sf_dir).search(_BM25_TERMS, k=10)
