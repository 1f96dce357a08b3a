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
# Hidden library entries: runnable/benchable building blocks that are folded
# into merged driver-visible entries (the driver correctness-checks at most
# the first 50 of queries(), so the visible inventory is kept under that).
_LIB_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_LIB_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None, bench: bool = False,
          hidden: bool = False):
    """Register a suite entry; ``oracle`` is DuckDB SQL or None (rows-only
    check).  ``hidden`` entries go to the library (merged elsewhere) instead
    of the driver-visible inventory."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        qs = _LIB_QUERIES if hidden else _QUERIES
        ors = _LIB_ORACLES if hidden else _ORACLES
        qs[name] = fn
        if oracle is not None:
            ors[name] = oracle
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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Visible + library entries (tests and bench see everything)."""
    _load_all()
    return {**_LIB_QUERIES, **_QUERIES}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {**_LIB_ORACLES, **_ORACLES}


def lib_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    return _LIB_QUERIES[name]


def lib_oracle(name: str) -> str:
    return _LIB_ORACLES[name]


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    merged = {**_LIB_QUERIES, **_QUERIES}
    return {k: v for k, v in merged.items() if k in _BENCH}


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
    from surrealdb_spark.suite import merged  # noqa: F401  (after children)

    _LOADED = True
