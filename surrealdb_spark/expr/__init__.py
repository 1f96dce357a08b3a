"""SurrealQL expression → Column compiler layer.

operators.py — binary/unary operator semantics (coercion, containment,
              null-coalescing, truthy ternary, ranges).
idiom.py    — path expressions (a.b[0][WHERE x > 1].c) over nested columns.
"""
