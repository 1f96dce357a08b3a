"""surrealdb_spark — a PySpark-native analytics engine with the query surface
of surrealdb/surrealdb (reference snapshot 2026-05-29, v3.1.0-alpha).

The reference is a row-oriented document-graph database with its own query
language (SurrealQL).  This package re-expresses its query semantics —
operators, scalar functions, graph traversal, full-text search, vector
search — as idiomatic PySpark DataFrame plans so Catalyst/Tungsten pick the
physical strategy, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the reference
lacks.

Layout (mirrors SURVEY.md §7):
    session     — tuned SparkSession builder
    catalog     — parquet table catalog over a scale-factor directory
    values      — value/type layer: RecordId, None/Null policy, cross-type order
    expr/       — SurrealQL expression → Column compiler
    functions/  — scalar function library (array:: string:: math:: time:: ...)
    operators/  — query operators (select pipeline, fetch, split, graph, knn, fulltext)
    pipeline/   — LLM-data-pipeline superset (dedup, similarity, text, multimodal)
    streaming/  — changefeed / live-select analogues on Structured Streaming
    suite/      — oracle-checked query inventory (drives __spark_entry__ and bench)
"""

__version__ = "0.1.0"

from surrealdb_spark.catalog import TABLES, Catalog
from surrealdb_spark.session import get_spark

__all__ = ["Catalog", "TABLES", "get_spark", "__version__"]
