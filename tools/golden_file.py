"""Run single golden files and print per-case results.

Usage: python tools/golden_file.py <rel-path-under-tests/language> ...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = Path("/root/reference/language-tests/tests/language")


def main() -> None:
    from surrealdb_spark.session import get_spark
    from surrealdb_spark.golden import run_file

    spark = get_spark()
    spark.sparkContext.setLogLevel("OFF")
    for rel in sys.argv[1:]:
        r = run_file(spark, str(CORPUS / rel))
        if r.skipped:
            print(f"== {rel}: SKIP ({r.skipped})")
            continue
        print(f"== {rel}: {r.passed}/{r.total}")
        for c in r.cases:
            mark = "ok  " if c.ok else "FAIL"
            line = c.statement.replace("\n", " ")[:78]
            print(f"  {mark} {line}")
            if not c.ok:
                print(f"       {c.detail[:150]}")


if __name__ == "__main__":
    main()
