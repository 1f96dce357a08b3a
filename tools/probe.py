"""Probe: evaluate SurrealQL expressions one-by-one, printing value or
first error line.  Usage: python tools/probe.py "expr" "expr" ...
or echo exprs (one per line) | python tools/probe.py -"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    exprs = sys.argv[1:]
    if exprs == ["-"]:
        exprs = [l.rstrip("\n") for l in sys.stdin if l.strip()]
    from surrealdb_spark.session import get_spark
    from surrealdb_spark.sql.parser import parse_expr
    from surrealdb_spark.sql.compiler import compile_expr

    spark = get_spark()
    spark.sparkContext.setLogLevel("OFF")
    for t in exprs:
        try:
            c = compile_expr(parse_expr(t), {})
            v = spark.range(1).select(c.alias("v")).first()["v"]
            print(f"OK   {t!r} -> {v!r}")
        except Exception as e:
            print(f"ERR  {t!r} -> {str(e).splitlines()[0][:150]}")


if __name__ == "__main__":
    main()
