"""Deterministically scale the sf0.1 testdata by an integer factor for
SCALING MEASUREMENTS ONLY (VERDICT r12 "Next round" #2/#6: at sf0.1 every
bench query is overhead-bound — 8-core within 10% of 32-core — so scale
wins/regressions are invisible; there is no driver-provided sf1).

Usage: python tools/make_scaled_sf.py [factor] [out_dir]
       (defaults: 10 /root/sf1.0 — i.e. an sf1-equivalent)

NOT an oracle fixture: /root/testdata stays untouched and no correctness
claim is made at this scale — parity stays gated on the driver SFs.  The
output is only used to run `bench.py` / `tools/profile_queries.py` with
`SPARK_GRAFT_SF_DIR=<out_dir>` so compute (not job-submission latency)
dominates and plan/scaling claims can be checked.

Construction (copy 0 = the original rows, copies 1..f-1 key-shifted by
i*N so every fact/dimension link stays intact and cardinalities scale
linearly):
  * region/nation: unchanged (scale-constant dimensions, as in TPC-H);
  * customer/supplier/part/orders/lineitem/events: keys shifted by
    i * (table's base row span); payload columns unchanged;
  * documents: every token gets a copy-suffix digit for copies > 0 so
    cross-copy Jaccard is 0 and near-dup structure scales linearly
    (duplicating text verbatim would grow candidate pairs quadratically);
  * embeddings: vectors cyclically rotated by i so norms and within-copy
    geometry are preserved while cross-copy near-duplicates are not
    manufactured.
Files are written with 64k-row row groups so scans parallelize (the sf0.1
fixtures are single-row-group — the r12 finding that motivated
Catalog.spread; at this layout spread must be identity, which is part of
what the scaled bench verifies).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
ROW_GROUP = 64 * 1024

# key column -> stride source table (stride = base table's key span)
SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 600_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 600_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": None},  # None -> max+1
}

_TOKEN = re.compile(r"[a-z0-9]+")


def scale_table(name: str, factor: int, out_dir: Path) -> None:
    tbl = pq.read_table(SRC / f"{name}.parquet")
    if name in ("region", "nation"):
        pq.write_table(tbl, out_dir / f"{name}.parquet", row_group_size=ROW_GROUP,
                       compression="zstd")
        print(f"{name}: {tbl.num_rows} rows (unchanged)")
        return

    copies = [tbl]
    if name == "documents":
        texts = tbl.column("text").to_pylist()
        for i in range(1, factor):
            suf = str(i)
            new_texts = [
                _TOKEN.sub(lambda m: m.group(0) + suf, t.lower()) if t else t
                for t in texts
            ]
            c = tbl.set_column(
                tbl.schema.get_field_index("doc_id"), "doc_id",
                pc.add(tbl.column("doc_id"), i * 5_000))
            c = c.set_column(
                c.schema.get_field_index("text"), "text",
                pa.array(new_texts, type=pa.string()))
            c = c.set_column(
                c.schema.get_field_index("n_chars"), "n_chars",
                pa.array([len(t) if t else 0 for t in new_texts],
                         type=pa.int64()))
            copies.append(c)
    elif name == "embeddings":
        vecs = np.vstack(tbl.column("embedding").to_pylist()).astype(np.float32)
        for i in range(1, factor):
            rolled = np.roll(vecs, i, axis=1)
            c = tbl.set_column(
                tbl.schema.get_field_index("vec_id"), "vec_id",
                pc.add(tbl.column("vec_id"), i * 2_000))
            c = c.set_column(
                c.schema.get_field_index("embedding"), "embedding",
                pa.array(list(rolled), type=pa.list_(pa.float32())))
            copies.append(c)
    else:
        shifts = dict(SHIFTS[name])
        for k, v in shifts.items():
            if v is None:
                shifts[k] = int(pc.max(tbl.column(k)).as_py()) + 1
        for i in range(1, factor):
            c = tbl
            for col, stride in shifts.items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c.column(col), i * stride)
                c = c.set_column(idx, col, shifted.cast(tbl.schema.field(col).type))
            copies.append(c)

    out = pa.concat_tables(copies)
    pq.write_table(out, out_dir / f"{name}.parquet", row_group_size=ROW_GROUP,
                   compression="zstd")
    print(f"{name}: {tbl.num_rows} -> {out.num_rows} rows")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/root/sf1.0")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        scale_table(name, factor, out_dir)


if __name__ == "__main__":
    main()
