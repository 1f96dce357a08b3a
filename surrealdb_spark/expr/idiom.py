"""Idiom path compiler: SurrealQL path expressions over nested columns.

Reference: Part enum core/src/expr/part.rs:21-38 — Field, All(*), Flatten,
Where([WHERE cond]), index, First, Last, Destructure, Optional(?.), Recurse —
evaluated by core/src/exec/physical_expr/idiom.rs, planned in
core/src/exec/planner/idiom.rs.

Spark mapping: getField / element_at / higher-order functions
(filter/transform/flatten) — all JVM-side expressions, no UDFs.  A path is
a list of parts:

    ("field", name)          .name         — struct field pick
    ("index", i)             [i]           — 0-based element pick
    ("first",) / ("last",)   [0] / [$]
    ("all",)                 [*] or .*     — map the REMAINING path over
                                             each element (array context)
    ("where", fn)            [WHERE cond]  — fn: element Column → boolean
    ("flatten",)             array-of-array flatten
    ("destructure", [paths]) .{a, b.c}     — struct of sub-picks

`[WHERE]` keeps the array (filter); `all` switches to mapping mode so later
field picks become F.transform — matching the reference's behavior of
idioms auto-applying across arrays after `.*`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Part = tuple


def compile_idiom(root: Column, parts: list[Part]) -> Column:
    """Compile a path over ``root``; returns the resulting Column."""
    return _walk(root, list(parts), mapped=False)


def _walk(col: Column, parts: list[Part], mapped: bool) -> Column:
    if not parts:
        return col
    kind, *args = parts[0]
    rest = parts[1:]

    if kind == "field":
        (name,) = args
        if mapped:
            return _walk(F.transform(col, lambda x: x.getField(name)), rest, mapped=True)
        return _walk(col.getField(name), rest, mapped=False)

    if kind == "index":
        (i,) = args
        # SurrealQL is 0-based; element_at is 1-based (negative = from end).
        # Out-of-bounds picks are NONE (value/idiom.rs), hence try_.
        pos = i + 1 if i >= 0 else i
        return _walk(F.try_element_at(col, F.lit(pos)), rest, mapped=False)

    if kind == "field_col":
        # dynamic object key obj[keyexpr] over a struct with KNOWN fields
        # (value/idiom.rs object index): chained whens, unmatched → NONE
        ((keyc, names),) = args
        out = F.lit(None)
        for nm in names:
            out = F.when(keyc == F.lit(nm), col.getField(nm)).otherwise(out)
        return _walk(out, rest, mapped=False)

    if kind == "index_col":
        (c,) = args
        pos = F.when(c >= 0, c + 1).otherwise(c).cast("int")
        return _walk(F.try_element_at(col, pos), rest, mapped=False)

    if kind == "first":
        return _walk(F.try_element_at(col, F.lit(1)), rest, mapped=False)

    if kind == "last":
        return _walk(F.try_element_at(col, F.lit(-1)), rest, mapped=False)

    if kind == "all":
        return _walk(col, rest, mapped=True)

    if kind == "where":
        (pred,) = args
        assert isinstance(pred, Callable)
        return _walk(F.filter(col, pred), rest, mapped)

    if kind == "flatten":
        return _walk(F.flatten(col), rest, mapped)

    if kind == "optional":
        # `?.` — null-propagating access (part.rs Optional).  Spark's
        # getField/element_at already propagate NULL through missing
        # parents, so this part is accepted as an explicit no-op marker.
        return _walk(col, rest, mapped)

    if kind == "destructure":
        (paths,) = args
        fields = [
            _walk(col, [("field", name), *sub], mapped).alias(name) for name, sub in paths
        ]
        return F.struct(*fields)

    raise ValueError(f"unknown idiom part: {kind}")
