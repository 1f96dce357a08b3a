"""Smaller statement surfaces: Mock source, EXPLAIN, INFO, TIMEOUT,
row-level permissions.

Reference:
  * Mock `|person:1000|` — N synthetic records (core/src/expr/mock.rs)
  * EXPLAIN / EXPLAIN FULL — plan + per-operator metrics
    (core/src/exec/operators/explain.rs:30,103; metrics.rs)
  * INFO FOR DB/TABLE — catalog rendering (statements/info.rs)
  * TIMEOUT — operator wrapper (operators/timeout.rs:25)
  * Permissions — per-table SELECT permission expressions evaluated per
    record (core/src/catalog/schema/mod.rs:42-47; exec/permission.rs) →
    an injected filter predicate, default-off for batch analytics.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def mock(spark: SparkSession, table: str, count: int) -> DataFrame:
    """`|table:count|` — N generated records with sequential record ids.
    spark.range is parallel and partition-pruned (no driver loop)."""
    return spark.range(count).select(
        F.concat(F.lit(f"{table}:"), (F.col("id") + 1).cast("string")).alias("id"),
        (F.col("id") + 1).alias("n"),
    )


def explain(df: DataFrame, analyze: bool = False) -> str:
    """EXPLAIN [FULL] — formatted plan; FULL (analyze) also runs the query
    so the Spark UI metrics populate (explain.rs AnalyzePlan analogue)."""
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    if analyze:
        df.write.format("noop").mode("overwrite").save()
    return plan


def with_timeout(df: DataFrame, seconds: float) -> list:
    """TIMEOUT wrapper: collect with a deadline; cancels the job group on
    expiry (the Spark analogue of the reference's timeout operator)."""
    spark = df.sparkSession
    group = f"timeout-{id(df)}"
    sc = spark.sparkContext
    result: dict = {}

    def run():
        sc.setJobGroup(group, "with_timeout", interruptOnCancel=True)
        try:
            result["rows"] = df.collect()
        except Exception as e:  # noqa: BLE001 — surfaced below
            result["error"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        sc.cancelJobGroup(group)
        raise TimeoutError(f"query exceeded {seconds}s")
    if "error" in result:
        raise result["error"]
    return result["rows"]


def info_for_db(catalog) -> dict:
    """INFO FOR DB — tables with schemas (statements/info.rs rendering)."""
    import os

    from surrealdb_spark.catalog import TABLES

    out: dict[str, dict] = {"tables": {}}
    for name in TABLES:
        if os.path.exists(catalog.path(name)):
            df = catalog.table(name)
            out["tables"][name] = {c: t for c, t in df.dtypes}
    return out


def info_for_functions() -> dict:
    """INFO-style function coverage per namespace."""
    from surrealdb_spark.functions.registry import coverage

    return coverage()


def with_permissions(
    df: DataFrame,
    permission: Column | Callable[[dict], Column] | None,
    session_params: dict | None = None,
) -> DataFrame:
    """Row-level SELECT permission: inject the permission predicate as a
    filter.  `Permission::Full` → None (no-op), `Permission::None` →
    F.lit(False), `Specific(expr)` → the expression, optionally a callable
    taking {$auth, $session} params (schema/mod.rs:42-47 semantics)."""
    if permission is None:
        return df
    pred = permission(session_params or {}) if callable(permission) else permission
    return df.filter(pred)
