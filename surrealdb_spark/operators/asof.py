"""As-of join + sessionization — time-series operators Spark lacks natively.

Neither exists in the reference (its time-series story is record-id range
scans, dbs/iterator.rs:63-65); both are required superset operators for
event analytics at scale (SURVEY §2.5 notes Window as the mechanism).

As-of join avoids per-group Python (`pd.merge_asof`) entirely: union the
two sides tagged, sort within (keys, time), and carry the right side's
last value forward with last_value(ignoreNulls) — one shuffle on the keys,
all JVM-side window evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts within the same keys (backward as-of join).

    Right side must be unique per (keys, right_ts) — pre-dedupe if not, OR
    pass ``right_tiebreak`` (value columns, ascending): among right rows
    tied on (keys, right_ts) the LAST under the tiebreak order wins, i.e.
    the max.  The tiebreak makes a pre-dedupe ``groupBy(keys, ts).max(v)``
    redundant — same winner, one Exchange less (r12 optimization, guide
    §2.4: the window's shuffle subsumes the dedup's).
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # Right rows sort before left rows at the same timestamp (__side 0 < 1)
    # so an exactly-simultaneous right row IS visible to the left row.
    # Left rows carry NULL in the tiebreak columns (NULLS FIRST), so the
    # tiebreak never reorders a left row relative to right rows.
    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col(f"{c}{suffix}").asc() for c in (right_tiebreak or [])
    ]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # All carries in ONE projection: every window expression (including the
    # tiebreak order's column references) resolves against the union's
    # original attributes.  A sequential withColumn loop would overwrite a
    # tiebreak column that is itself a value column before later windows
    # resolve, silently changing which tied right row later columns pick.
    carried = unioned.withColumns(
        {
            f"{c}{suffix}": F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
            for c in value_cols
        }
    )
    return carried.filter(F.col("__side") == 1).drop("__t", "__side")


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap: Column,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event exceeds ``gap`` (same units as ts_col).  Adds ``session_id``
    (0-based per user) — lag + cumulative-sum-of-boundaries, one shuffle.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (order_tiebreak or [])]
    w = W.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = (prev.isNull() | ((F.col(ts_col) - prev) > gap)).cast("int")
    run = W.partitionBy(user_col).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    return events.withColumn("session_id", F.sum(new_session).over(run) - 1)
