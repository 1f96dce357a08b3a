"""Skew + co-location helpers: salted joins, bucketed table writes.

The reference is single-node (SURVEY §3: no distributed execution) so none
of this exists there — on a 1000-executor cluster these are the difference
between a 10-minute and a 10-hour join:

  * salted_join — hot join keys (a celebrity user, an empty-string token)
    overload one reducer; salting replicates the build side R ways and
    scatters the probe side across R sub-keys.  AQE's skew-join handles
    sort-merge cases adaptively; explicit salting is for broadcast-averse
    aggregations and deterministic plans.
  * write_bucketed — bucketBy co-locates both sides of a recurring join
    key at write time so later joins skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an R-way salt on the key.

    left gets a random-but-deterministic salt in [0, R) (hash of a stable
    row fingerprint — not rand(), so retries/plan-reuse stay consistent);
    right is exploded R ways.  Result equals a plain join on `key`.
    """
    # Hash terms beyond the key decorrelate rows sharing a hot key:
    l_salt = F.pmod(
        F.xxhash64(F.col(key), F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(salt),
    )
    lt = left.withColumn("__salt", l_salt)
    rt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return lt.join(rt, [key, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist hash-bucketed by ``key`` so subsequent joins/aggregations on
    it are shuffle-free (SortMergeJoin over pre-bucketed scans)."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Key-skew diagnostic: top key frequencies + share of total."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
    )
