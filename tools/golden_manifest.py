"""Regenerate tests/golden_manifest.json from a full corpus scan report.

Usage:
    python tools/golden_scan.py --out /tmp/report_full.json
    python tools/golden_manifest.py /tmp/report_full.json [...more reports]

Files at 100% across the given reports go into the manifest; the test gate
then holds them green forever.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    files: list[str] = []
    cases = 0
    for rpt in sys.argv[1:]:
        r = json.load(open(rpt))
        for rel, f in r["files"].items():
            if "skipped" in f or "crash" in f:
                continue
            if f["total"] > 0 and not f["fails"]:
                files.append(rel)
                cases += f["total"]
    files = sorted(set(files))
    out = {"files": files, "cases": cases}
    path = Path(__file__).resolve().parent.parent / "tests" / "golden_manifest.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"{len(files)} files / {cases} cases -> {path}")


if __name__ == "__main__":
    main()
