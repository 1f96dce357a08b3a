"""Fluent SDK: the programmatic entry point sharing the SurrealQL IR.

Reference architecture (SURVEY §3, entry point 2): RPC/SDK verbs
(surrealdb/src/method/*.rs) construct the same ``expr::*Statement`` ASTs the
SQL parser produces and run through the same executor.  This module does
exactly that — builders assemble a ``sql.parser.Select`` (the shared IR)
and compile through ``sql.compiler.compile_select``, so every feature the
SurrealQL surface gains (aggregate decomposition, subquery rewrites, graph
projections, FETCH) is automatically available programmatically, and both
entry points stay semantically identical by construction.

    q = (Surreal(spark, sf_dir).table("orders")
         .where("o_totalprice > $min")
         .select("o_orderkey", "o_totalprice")
         .order_by("o_totalprice", desc=True)
         .limit(10)
         .bind(min=400000))
    df = q.run()
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from surrealdb_spark.catalog import Catalog
from surrealdb_spark.sql.compiler import compile_select
from surrealdb_spark.sql.parser import Field, OrderKey, Parser, Select


def _expr(src: str):
    p = Parser(src)
    e = p.expr(0)
    p.expect("eof")
    return e


class Query:
    """Immutable builder over the shared Select IR."""

    def __init__(self, spark: SparkSession, cat: Catalog, sel: Select, params: dict):
        self._spark = spark
        self._cat = cat
        self._sel = sel
        self._params = params

    def _with(self, **changes) -> Query:
        return Query(self._spark, self._cat, replace(self._sel, **changes), self._params)

    def select(self, *fields: str) -> Query:
        parsed = []
        for f in fields:
            alias = None
            if " AS " in f:
                f, alias = f.split(" AS ", 1)
            parsed.append(Field(_expr(f.strip()), alias.strip() if alias else None))
        return self._with(fields=parsed)

    def value(self, expr: str) -> Query:
        return self._with(value_expr=_expr(expr))

    def where(self, cond: str) -> Query:
        e = _expr(cond)
        if self._sel.where is not None:
            e = ("bin", "AND", self._sel.where, e)
        return self._with(where=e)

    def split(self, *fields: str) -> Query:
        return self._with(split=list(fields))

    def group_by(self, *keys: str) -> Query:
        return self._with(group=[_expr(k) for k in keys])

    def group_all(self) -> Query:
        return self._with(group=[])

    def order_by(self, expr: str, desc: bool = False, numeric: bool = False) -> Query:
        k = OrderKey(_expr(expr), desc=desc, numeric=numeric)
        return self._with(order=[*self._sel.order, k])

    def limit(self, n: int) -> Query:
        return self._with(limit=n)

    def start(self, n: int) -> Query:
        return self._with(start=n)

    def fetch(self, *fields: str) -> Query:
        return self._with(fetch=list(fields))

    def omit(self, *fields: str) -> Query:
        return self._with(omit=list(fields))

    def bind(self, **params) -> Query:
        return Query(self._spark, self._cat, self._sel, {**self._params, **params})

    def run(self) -> DataFrame:
        return compile_select(self._spark, self._sel, catalog=self._cat, params=self._params)

    def to_surql_ir(self) -> Select:
        """The shared IR — inspectable, comparable with parse_select output."""
        return self._sel


class Surreal:
    """Session handle (the SDK's `db` object)."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None, catalog: Catalog | None = None):
        self.spark = spark
        self.catalog = catalog or Catalog(spark, sf_dir)

    def table(self, name: str) -> Query:
        return Query(self.spark, self.catalog, Select(fields=None, value_expr=None, sources=[name]), {})

    def query(self, surql_text: str, **params) -> DataFrame:
        """Raw SurrealQL — same IR, same compiler (entry point 1)."""
        from surrealdb_spark.sql.parser import parse_select

        return compile_select(
            self.spark, parse_select(surql_text), catalog=self.catalog, params=params
        )
