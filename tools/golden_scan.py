"""Scan the full reference golden corpus and write a failure report.

Usage:
    python tools/golden_scan.py [subdir-or-glob ...] [--out report.json]

Runs every `.surql` under /root/reference/language-tests/tests/language
(or the given subset) through `surrealdb_spark.golden.run_file`, then
writes a JSON report: per-file pass/total, plus per-case failure details
for everything that failed — used to bucket failure categories and to
regenerate `tests/golden_manifest.json` (files at 100%).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS_ROOT = Path("/root/reference/language-tests/tests/language")


def main() -> None:
    argv = sys.argv[1:]
    out_path = "golden_report.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]

    if args:
        paths: list[Path] = []
        for a in args:
            p = CORPUS_ROOT / a
            if p.is_dir():
                paths.extend(sorted(p.rglob("*.surql")))
            elif p.is_file():
                paths.append(p)
            else:
                paths.extend(sorted(CORPUS_ROOT.rglob(a)))
    else:
        paths = sorted(CORPUS_ROOT.rglob("*.surql"))

    from surrealdb_spark.session import get_spark
    from surrealdb_spark.golden import run_file

    spark = get_spark()
    report: dict = {"files": {}, "t0": time.time()}
    n_pass = n_total = files_100 = 0
    for i, p in enumerate(paths):
        rel = str(p.relative_to(CORPUS_ROOT))
        try:
            r = run_file(spark, str(p))
        except Exception as exc:  # runner crash = every case failed
            report["files"][rel] = {"crash": repr(exc)[:300]}
            continue
        if r.skipped:
            report["files"][rel] = {"skipped": r.skipped}
            continue
        fails = [
            {
                "stmt": c.statement[:200],
                "expected": repr(c.expected)[:200],
                "actual": repr(c.actual)[:200],
                "detail": c.detail[:200],
            }
            for c in r.cases
            if not c.ok
        ]
        report["files"][rel] = {"passed": r.passed, "total": r.total, "fails": fails}
        n_pass += r.passed
        n_total += r.total
        files_100 += r.all_ok
        if (i + 1) % 10 == 0:
            # checkpoint — a killed scan still leaves a usable report
            Path(out_path).write_text(json.dumps(report, indent=1))
            print(
                f"[{i+1}/{len(paths)}] {n_pass}/{n_total} cases, "
                f"{files_100} files@100% ({time.time()-report['t0']:.0f}s)",
                flush=True,
            )
    report["summary"] = {
        "files_scanned": len(paths),
        "files_100": files_100,
        "cases_pass": n_pass,
        "cases_total": n_total,
        "elapsed": time.time() - report["t0"],
    }
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps(report["summary"]))


if __name__ == "__main__":
    main()
