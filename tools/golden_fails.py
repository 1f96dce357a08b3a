"""Print only FAILING cases of golden files, full want/got detail.

Usage: python tools/golden_fails.py <rel-path> ...
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
            print(f"== {rel}: SKIP ({r.skipped})", flush=True)
            continue
        print(f"== {rel}: {r.passed}/{r.total}", flush=True)
        for c in r.cases:
            if c.ok:
                continue
            print("STMT:", c.statement.replace("\n", " ")[:200])
            w = c.expected[1] if len(c.expected) > 1 else c.expected
            print("WANT:", str(w)[:1500])
            print("GOT :", str(c.actual)[:1500])
            print("-" * 70, flush=True)


if __name__ == "__main__":
    main()
