"""Per-query phase profiler: build / plan / first-exec / warm-exec.

Usage: python tools/profile_queries.py [--all | name ...]

For each query: time (a) builder call (DataFrame construction incl. catalog
reads), (b) queryExecution().executedPlan force (analysis+optimization+
physical planning), (c) noop-sink execution, (d) second noop execution
(warm).  Prints one JSON line per query and a total line.
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


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:]]
    spark = get_spark("profile")

    from surrealdb_spark.suite._util import ft_index, srp_signed

    ft_index(spark, sf_dir)
    srp_signed(spark, sf_dir)

    qs = suite.all_queries() if "--all" in args else suite.bench_queries()
    names = [a for a in args if a != "--all"] or sorted(qs)
    rows = []
    for name in names:
        fn = qs[name]
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            noop(df)
            t3 = time.perf_counter()
            noop(fn(spark, sf_dir))
            t4 = time.perf_counter()
            row = {
                "q": name,
                "build": round(t1 - t0, 3),
                "plan": round(t2 - t1, 3),
                "exec1": round(t3 - t2, 3),
                "full2": round(t4 - t3, 3),
            }
        except Exception as exc:
            row = {"q": name, "err": f"{type(exc).__name__}: {exc}"[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    tot = {
        k: round(sum(r.get(k, 0) for r in rows), 3)
        for k in ("build", "plan", "exec1", "full2")
    }
    print(json.dumps({"q": "_total", **tot}))


if __name__ == "__main__":
    main()
