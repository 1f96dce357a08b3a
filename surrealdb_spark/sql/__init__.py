"""SurrealQL front end: tokenizer, Pratt parser, SELECT compiler.

Mirrors the reference's query lifecycle (SURVEY.md §3): SQL text → AST →
logical select plan → DataFrame ops — the same logical layer the Python
DataFrame-style API (operators/, dml.py) targets, as in the reference
where SDK verbs and parsed SurrealQL share the expr::* IR.
"""

from surrealdb_spark.sql.compiler import surql
from surrealdb_spark.sql.parser import parse_expr, parse_select

__all__ = ["surql", "parse_select", "parse_expr"]
