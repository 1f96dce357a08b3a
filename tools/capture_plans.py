"""Capture .explain("formatted") for every bench query → plans/r12/.

Usage: python tools/capture_plans.py [suffix] [query ...]
Writes plans/r12/<query>_<suffix>.txt (suffix defaults to "before").
Plans are captured without executing the query (cheap), after the same
warmup (ft/srp index build) the bench itself performs so plan inputs match.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from surrealdb_spark import get_spark  # noqa: E402
from surrealdb_spark import suite  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_capture")

    from surrealdb_spark.suite._util import ft_index, srp_signed

    ft_index(spark, sf_dir)
    srp_signed(spark, sf_dir)

    bench = suite.bench_queries()
    for name in sorted(bench):
        if only and name not in only:
            continue
        df = bench[name](spark, sf_dir)
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
