"""Count Spark jobs submitted while building + executing suite queries.

Usage: python tools/count_jobs.py name [name ...]

Steal-independent evidence for driver-round reductions (VERDICT r12 #3):
job IDs are monotonically increasing, so the number of jobs a query costs
is (probe job id after) - (probe job id before) - 1, regardless of which
thread submitted them (thread pools included, which per-group tracking
would miss).  Also prints build/exec wall seconds for context.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surrealdb_spark import get_spark  # noqa: E402
from surrealdb_spark import suite  # noqa: E402


def probe_job_id(spark) -> int:
    spark.sparkContext.setJobGroup("__probe", "job-count probe")
    spark.range(1).count()
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup("__probe")
    spark.sparkContext.setJobGroup(None, None)
    return max(ids)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jobcount")
    from surrealdb_spark.suite._util import ft_index, srp_signed

    ft_index(spark, sf_dir)
    srp_signed(spark, sf_dir)
    qs = suite.all_queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        j0 = probe_job_id(spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = probe_job_id(spark)
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        j2 = probe_job_id(spark)
        print(json.dumps({
            "q": name,
            "build_jobs": j1 - j0 - 1,
            "exec_jobs": j2 - j1 - 1,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
        }))


if __name__ == "__main__":
    main()
