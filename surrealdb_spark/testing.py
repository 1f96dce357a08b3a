"""Local replica of the driver's correctness gate.

For each suite entry with an oracle: run the PySpark query and the DuckDB
oracle SQL over the same parquet tables, then compare row count, column
names, and (order-insensitively) every value.  Exact float equality is
required — the suite's determinism contract (decimal-exact aggregation)
makes that achievable, and anything that passes exact comparison passes any
driver-side value-hash.

CLI: ``python -m surrealdb_spark.testing [--sf DIR] [name ...]``
"""

from __future__ import annotations

import datetime as _dt
import math

import numpy as np
import pandas as pd

from surrealdb_spark.catalog import TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon_cell(x)) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(v[k])!s}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return v


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — order-insensitive."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        else:
            df[c] = s.map(_canon_cell).astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    g, w = canonicalize(got), canonicalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        # Dtype-strict: the driver's value-hash distinguishes int64 from
        # float64 (67 != 67.0), so a numeric cross-dtype match here would
        # pass locally and fail the driver.  Round-1 lesson (VERDICT.md).
        if gv.dtype != wv.dtype:
            raise AssertionError(
                f"{name}: column {c} dtype {gv.dtype} != oracle {wv.dtype} "
                f"(driver hash is dtype-sensitive; CAST the oracle or the query)"
            )
        if gv.dtype.kind == "f":
            ok = (gv == wv) | (np.isnan(gv) & np.isnan(wv))
        else:
            ok = gv == wv
        if not bool(np.all(ok)):
            bad = np.where(~ok)[0][:5]
            detail = "; ".join(f"row{int(i)}: {gv[i]!r} != {wv[i]!r}" for i in bad)
            raise AssertionError(f"{name}: column {c} mismatch — {detail}")


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    """Run spark-vs-duckdb parity for the named (or all oracled) queries.

    Returns {name: 'ok' | error string}; raises nothing.
    """
    from surrealdb_spark import suite

    # Verify the library children individually too — the driver only sees
    # the merged entries, but a child failure should be locally attributable.
    qs, oracles = suite.all_queries(), suite.all_oracles()
    results: dict[str, str] = {}
    for name in names or sorted(oracles):
        try:
            got = qs[name](spark, sf_dir).toPandas()
            want = duckdb_run(oracles[name], sf_dir)
            compare_frames(name, got, want)
            results[name] = "ok"
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            results[name] = f"FAIL: {e}"
    return results


def main() -> int:
    import argparse

    from surrealdb_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    spark = get_spark("parity")
    results = run_parity(spark, args.sf, args.names or None)
    width = max(len(n) for n in results)
    fails = 0
    for n, r in sorted(results.items()):
        print(f"{n:<{width}}  {r}")
        fails += r != "ok"
    print(f"\n{len(results) - fails}/{len(results)} ok")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
