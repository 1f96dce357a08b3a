"""Capture .explain("formatted") for suite queries → plans/<round>/.

Usage: python tools/capture_plans.py [--round rNN] [--all] [suffix] [query ...]
Writes plans/<round>/<query>_<suffix>.txt (suffix defaults to "before";
round defaults to r13).  With --all the non-bench library queries are
capturable too.  Plans are captured without executing the query (cheap),
after the same warmup (ft/srp index build) the bench itself performs so
plan inputs match.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surrealdb_spark import get_spark  # noqa: E402
from surrealdb_spark import suite  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    rnd = "r13"
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        del args[i : i + 2]
    use_all = "--all" in args
    args = [a for a in args if a != "--all"]
    suffix = args[0] if args else "before"
    only = set(args[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_capture")

    from surrealdb_spark.suite._util import ft_index, srp_signed

    ft_index(spark, sf_dir)
    srp_signed(spark, sf_dir)

    qs = suite.all_queries() if use_all else suite.bench_queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
