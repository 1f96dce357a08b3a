"""Changefeed + LIVE SELECT on Structured Streaming.

Reference semantics:
  * DEFINE TABLE ... CHANGEFEED <dur> — per-table change log with retention
    GC (core/src/cf/writer.rs, gc.rs, mutations.rs); versionstamp-ordered,
    no event-time semantics.
  * SHOW CHANGES FOR TABLE t SINCE <ts|versionstamp> [LIMIT n]
    (core/src/expr/statements/show.rs:10-23).
  * LIVE SELECT [DIFF|fields] FROM t [WHERE cond]: every committed mutation
    is evaluated against cond and pushed as {action, result}
    (core/src/expr/statements/live.rs:17-30; doc/lives.rs:223-285).
  * KILL <uuid> — cancel (kill.rs).

Spark mapping (Delta-less; this image has no Delta jars): dml.Database
appends change rows to <table>/_changes parquet — the change log IS a
streaming file source, so:
  SHOW CHANGES  = batch read of _changes with a versionstamp predicate;
  LIVE SELECT   = readStream over _changes + WHERE + projection, one
                  notification row per mutation (actions CREATE/UPDATE/
                  DELETE);
  KILL          = StreamingQuery.stop().
Watermarks/windows don't exist in the reference (changefeed is
versionstamp-ordered); windowed_agg below is our documented superset for
event-time analytics over the same stream.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("versionstamp", T.LongType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("before", T.StringType(), True),  # JSON pre-image (UPDATE/DELETE)
        T.StructField("after", T.StringType(), True),  # JSON of the record
    ]
)


def show_changes(
    spark: SparkSession,
    table_root: str,
    since_versionstamp: int = 0,
    limit: int | None = None,
) -> DataFrame:
    """SHOW CHANGES FOR TABLE ... SINCE vs [LIMIT n] — batch change read,
    versionstamp-ordered (show.rs:40)."""
    df = (
        spark.read.schema(CHANGE_SCHEMA)
        .parquet(f"{table_root}/_changes")
        .filter(F.col("versionstamp") >= since_versionstamp)
        .orderBy("versionstamp", "record_id")
    )
    return df.limit(limit) if limit is not None else df


def live_select(
    spark: SparkSession,
    table_root: str,
    where: Column | None = None,
    fields: list[str] | None = None,
    record_schema: str | None = None,
) -> DataFrame:
    """LIVE SELECT — a streaming DataFrame of notifications.

    Each mutation appears as (versionstamp, action, record_id, <fields...>).
    ``record_schema`` (DDL string) parses the JSON payload so ``where`` /
    ``fields`` can reference record columns, mirroring lives.rs condition
    evaluation against the mutated document.
    """
    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(f"{table_root}/_changes")
    if record_schema:
        stream = stream.withColumn("record", F.from_json("after", record_schema))
        stream = stream.select("versionstamp", "action", "record_id", "record.*")
    if where is not None:
        # DELETE notifications carry the last-known record (after = the
        # deleted row's content, written by dml._post_write) so conditions
        # evaluate against it — matching doc/lives.rs behavior.
        stream = stream.filter(where)
    if fields:
        stream = stream.select("versionstamp", "action", "record_id", *fields)
    return stream


def start_live(
    stream: DataFrame, name: str, trigger_seconds: float | None = None
) -> StreamingQuery:
    """Materialize a LIVE SELECT into an in-memory sink (queryable as
    ``SELECT * FROM <name>``).  Returns the handle; KILL = .stop()."""
    writer = stream.writeStream.outputMode("append").format("memory").queryName(name)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def kill(query: StreamingQuery) -> None:
    """KILL <live-query> (kill.rs)."""
    query.stop()


def windowed_agg(
    events: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Superset: tumbling/sliding event-time windows with late-data
    watermarks over any stream (absent in the reference, §2.12 —
    time::group+GROUP BY is its only bucketing)."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    grouped = events.withWatermark(ts_col, watermark).groupBy(w, *(keys or []))
    return grouped.agg(*(aggs or [F.count(F.lit(1)).alias("n")]))


def live_select_diff(spark: SparkSession, table_root: str) -> DataFrame:
    """LIVE SELECT DIFF — notifications carry a JSON-Patch between the pre-
    and post-image (live.rs DIFF mode; patches via value::diff semantics,
    expr/operation.rs).  Arrow-batched UDF computes the patch."""
    import json

    @F.pandas_udf(T.StringType())
    def patch(before: pd.Series, after: pd.Series) -> pd.Series:
        from surrealdb_spark.dml import diff_patch

        out = []
        for b, a in zip(before, after):
            bd = json.loads(b) if b else {}
            ad = json.loads(a) if a else {}
            out.append(json.dumps(diff_patch(bd, ad)))
        return pd.Series(out)

    stream = spark.readStream.schema(CHANGE_SCHEMA).parquet(f"{table_root}/_changes")
    return stream.select(
        "versionstamp", "action", "record_id", patch("before", "after").alias("diff")
    )
