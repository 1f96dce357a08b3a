"""FETCH: replace record-id fields with the full referenced record.

Reference: core/src/exec/operators/fetch.rs:27 (493 LoC) — a left outer
join + struct re-embed; arrays of ids explode, join, and re-nest.  The
record-link idiom (``person.bestfriend.name``) is the same join with an
immediate field pick.

Spark shape: broadcast the target when small; for array fields the row
needs a stable key to re-nest on (pass ``key_cols``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch(
    df: DataFrame,
    field: str,
    target: DataFrame,
    target_id: str,
    broadcast: bool = True,
) -> DataFrame:
    """Scalar FETCH: ``field`` holds one record id → becomes a struct of the
    target row (None stays None — left join).
    """
    tcols = [c for c in target.columns]
    t = target.select(
        F.col(target_id).alias("__fetch_id"),
        F.struct(*[F.col(c) for c in tcols]).alias("__fetched"),
    )
    if broadcast:
        t = F.broadcast(t)
    out = df.join(t, df[field] == t.__fetch_id, "left")
    return out.withColumn(field, F.col("__fetched")).drop("__fetch_id", "__fetched")


def fetch_array(
    df: DataFrame,
    field: str,
    key_cols: list[str],
    target: DataFrame,
    target_id: str,
    broadcast: bool = True,
) -> DataFrame:
    """Array FETCH: ``field`` holds an array of record ids → array of structs.

    explode → join → collect_list re-nest keyed on ``key_cols``
    (fetch.rs handles this inside the operator; Spark needs the explicit
    explode/re-group, which shuffles on key_cols once).
    """
    exploded = df.select(
        *key_cols, F.posexplode_outer(F.col(field)).alias("__pos", "__rid")
    )
    t = target.select(
        F.col(target_id).alias("__fetch_id"),
        F.struct(*[F.col(c) for c in target.columns]).alias("__fetched"),
    )
    if broadcast:
        t = F.broadcast(t)
    joined = exploded.join(t, exploded.__rid == t.__fetch_id, "left")
    # posexplode_outer emits a (pos=NULL) placeholder for empty/NULL arrays
    # so those rows survive the groupBy; strip it during re-nest (both
    # empty and NULL arrays come back as []).
    renested = joined.groupBy(*key_cols).agg(
        F.transform(
            F.filter(
                F.array_sort(F.collect_list(F.struct("__pos", "__fetched"))),
                lambda s: s.getField("__pos").isNotNull(),
            ),
            lambda s: s.getField("__fetched"),
        ).alias(field)
    )
    return df.drop(field).join(renested, key_cols, "left")


def fetch_array_nested(
    df: DataFrame,
    head: str,
    rest: str,
    key_cols: list[str],
    target: DataFrame,
    target_id: str,
    broadcast: bool = True,
) -> DataFrame:
    """Nested FETCH inside an array of structs: ``head`` is an
    array<struct> column whose elements carry a record-id field ``rest``;
    each element's ``rest`` becomes the full target row
    (fetch.rs:27 walks the idiom into array elements — `FETCH
    purchases.out` re-embeds INSIDE the already-fetched parent).

    posexplode → join on elem.rest → withField replace → re-nest; one
    shuffle keyed on ``key_cols``.
    """
    exploded = df.select(
        *key_cols, F.posexplode_outer(F.col(head)).alias("__pos", "__elem")
    )
    t = target.select(
        F.col(target_id).alias("__fetch_id"),
        F.struct(*[F.col(c) for c in target.columns]).alias("__fetched"),
    )
    if broadcast:
        t = F.broadcast(t)
    joined = exploded.join(
        t, F.col(f"__elem.{rest}").cast("string") == t.__fetch_id, "left")
    joined = joined.withColumn(
        "__elem2",
        F.when(F.col("__elem").isNull(), F.lit(None)).otherwise(
            F.col("__elem").withField(rest, F.col("__fetched"))),
    )
    renested = joined.groupBy(*key_cols).agg(
        F.transform(
            F.filter(
                F.array_sort(F.collect_list(F.struct("__pos", "__elem2"))),
                lambda s: s.getField("__pos").isNotNull(),
            ),
            lambda s: s.getField("__elem2"),
        ).alias(head)
    )
    return df.drop(head).join(renested, key_cols, "left")
