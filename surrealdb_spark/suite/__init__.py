"""Oracle-checked query inventory.

Every implemented operator from SURVEY.md §2 gets a named entry here: a
PySpark builder ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables.  ``__spark_entry__.py`` and ``bench.py`` both read this registry.

Determinism contract (so the driver's order-insensitive value-hash matches):
  * money/score aggregates go through exact DECIMAL arithmetic and are cast
    to DOUBLE only at the end — bit-identical across engines regardless of
    aggregation order (float sums are order-dependent; decimal sums are not);
  * averages are computed as CAST(decimal_sum AS DOUBLE) / count;
  * timestamps in outputs are cast to DATE or STRING;
  * every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}
_BENCH: set[str] = set()


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a suite entry; ``oracle`` is DuckDB SQL or None (rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if bench:
            _BENCH.add(name)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v for k, v in _QUERIES.items() if k in _BENCH}


_LOADED = False


def _load_all() -> None:
    """Import all suite modules (each registers its queries on import)."""
    global _LOADED
    if _LOADED:
        return
    from surrealdb_spark.suite import (  # noqa: F401
        analytics,
        dedup,
        events_analytics,
        functions_sampler,
        graph,
        relational,
        relational2,
        relational3,
        surql,
        text,
        vector,
    )

    _LOADED = True
