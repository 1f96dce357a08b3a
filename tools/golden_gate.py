"""Golden-gate shard runner: run one slice of tests/golden_manifest.json.

Usage:
    python tools/golden_gate.py --shard I --nshards N --out report.json

Runs manifest files [I::N] through `surrealdb_spark.golden.run_file` in
its own Spark session (size it via SPARK_GRAFT_CPUS / SPARK_GRAFT_DRIVER_MEM
in the environment) and writes a JSON report ``{rel: {"passed": p,
"total": t, "fail": detail-or-null}}``.  The pytest gate
(`tests/test_golden_corpus.py`) launches N of these concurrently so the
full 1,000+-file corpus finishes inside the driver's budget; each shard is
a separate process because the statement runner's per-connection state
(fn:: registry, schema provider, session context) is process-global.
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

    def opt(name: str, default: str) -> str:
        return argv[argv.index(name) + 1] if name in argv else default

    shard = int(opt("--shard", "0"))
    nshards = int(opt("--nshards", "1"))
    out_path = opt("--out", f"/tmp/golden_gate_{shard}.json")
    manifest = json.load(
        open(Path(__file__).resolve().parent.parent / "tests" / "golden_manifest.json")
    )
    files = manifest["files"][shard::nshards]

    from surrealdb_spark.golden import run_file
    from surrealdb_spark.session import get_spark

    spark = get_spark(f"golden_gate_{shard}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    results: dict[str, dict] = {}
    for rel in files:
        try:
            r = run_file(spark, str(CORPUS_ROOT / rel))
        except Exception as exc:  # runner crash = file failed
            results[rel] = {"passed": 0, "total": -1, "fail": f"crash: {exc!r}"[:300]}
            continue
        if r.skipped:
            results[rel] = {"passed": 0, "total": 0, "fail": f"unexpected skip: {r.skipped}"}
            continue
        bad = [c for c in r.cases if not c.ok]
        results[rel] = {
            "passed": r.passed,
            "total": r.total,
            "fail": None
            if not bad
            else f"{bad[0].statement[:80]!r} -> {bad[0].detail[:150]}",
        }
    json.dump(
        {"shard": shard, "nshards": nshards, "sec": round(time.time() - t0, 1), "files": results},
        open(out_path, "w"),
    )
    print(f"shard {shard}/{nshards}: {len(files)} files in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
