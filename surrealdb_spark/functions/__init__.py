"""Scalar function library, one module per reference namespace
(core/src/fnc/mod.rs dispatch table, ~419 built-ins — SURVEY.md §2.11).

Native-first: every function that can be a JVM-side Column expression is one
(whole-stage codegen, no Python in the hot path); Pandas UDFs only where
Spark has no primitive.
"""
