"""Parquet table catalog over a scale-factor directory.

The reference resolves tables lazily against its catalog at plan time
(surrealdb: core/src/exec/planner/select.rs plan_sources); here the catalog
is a directory of parquet files — the native table format of this engine —
and ``Catalog.table`` is the TableScan operator
(reference: core/src/exec/operators/scan/table.rs:39).  Catalyst handles
predicate pushdown / column pruning / partition pruning on top of the scan,
subsuming the reference's IndexScan/UnionIndexScan/CountScan fast paths
(core/src/exec/operators/scan/{index,union_index,count}.rs).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Lazy table loader + temp-view registrar for one scale-factor dir."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}
        # The engine's timestamp semantics are UTC (values.py); pin the
        # session so results don't depend on the caller's session defaults
        # (the driver runs queries() under its own SparkSession).
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # pyspark >= 4.1 defaults inferTimestampNTZ=true, turning tz-naive
            # parquet timestamps into TIMESTAMP_NTZ (unix_millis & watermarks
            # reject it). The engine's timestamps are UTC instants.
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        except Exception:
            pass
        # RELATE-created edge tables (in/out record-id columns) registered
        # for graph traversal in queries (operators/graph.py shapes them).
        self.edges: dict[str, DataFrame] = {}
        # Row-level SELECT permissions (catalog/schema/mod.rs:42-47):
        # table → Column | callable(session)->Column | False (deny-all).
        # Applied by the compiler at scan resolution; $auth/$session come
        # from `self.auth` (set_auth).
        self.permissions: dict[str, object] = {}
        self.auth: dict = {}

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    # Shared resolved-scan cache (r12): `spark.read.parquet` re-lists the
    # path and re-reads footers on every call — pure catalog-resolution
    # overhead (~0.1 s/table locally) that a real engine's catalog caches.
    # Keyed per-session (weakly — a stopped, dropped session releases its
    # whole sub-cache instead of being pinned for the process lifetime)
    # then by (path, mtime, size); holds the LAZY DataFrame (schema + file
    # index), never any computed rows, and only for the read-only fixture
    # TABLES — engine-written tables go through register().  Bounded: a
    # long-lived service re-pointing at many sf dirs evicts oldest-first.
    _scan_cache: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
        weakref.WeakKeyDictionary()
    )
    _CACHE_MAX_ENTRIES = 256

    def _session_scans(self) -> dict:
        sub = Catalog._scan_cache.get(self.spark)
        if sub is None:
            sub = Catalog._scan_cache[self.spark] = {}
        return sub

    def table(self, name: str) -> DataFrame:
        """TableScan: full scan of a table; Catalyst prunes columns/rows."""
        if name not in self._cache and name in TABLES:
            shared = self._session_scans().get(self._scan_key(name))
            if shared is not None:
                self._cache[name] = shared
        if name not in self._cache:
            if name == "events":
                # events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects
                # outright; read the raw int64 nanos and convert (µs precision).
                try:
                    self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                except Exception:
                    pass
            df = self.spark.read.parquet(self.path(name))
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                from pyspark.sql import functions as F

                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            # Normalize any TIMESTAMP_NTZ column (pyspark>=4.1 inference on
            # tz-naive parquet) to TIMESTAMP — session tz is pinned UTC above,
            # so the cast is a pure type change, not a wall-clock shift.
            ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
            if ntz:
                from pyspark.sql import functions as F

                df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
            self._cache[name] = df
            if name in TABLES:
                sub = self._session_scans()
                if len(sub) >= Catalog._CACHE_MAX_ENTRIES:
                    sub.pop(next(iter(sub)))
                sub[self._scan_key(name)] = df
        return self._cache[name]

    def _scan_key(self, name: str) -> tuple:
        """Cache key carrying path mtime/size so a rewritten file (tmp-dir
        fixtures in tests) never serves a stale file index."""
        path = self.path(name)
        return (path, self._stamp(path))

    @staticmethod
    def _stamp(path: str) -> tuple | None:
        try:
            st = os.stat(path)
            return (st.st_mtime_ns, st.st_size)
        except OSError:
            return None

    # -- scan-spread escape hatch (r12, guide §2: derive partitioning from
    # input size).  A parquet scan cannot parallelize below row-group
    # granularity; the testdata files are single-row-group, so every
    # scan+map stage is pinned to one task per file no matter the split
    # config.  ``spread(df, table, key)`` inserts a hash repartition across
    # the cores ONLY when the table's own layout caps scan parallelism
    # below the core count AND the table is small enough that the extra
    # exchange is cheap (<1 GiB default).  At 100 TB inputs have many row
    # groups / exceed the cap → identity, plan unchanged.  Callers use it
    # where map-side work is CPU-heavy per byte (decimal aggregation,
    # hash fingerprinting) — not blanket, because the extra stage taxes
    # cheap scans more than single-threading does.
    _SPREAD_MAX_BYTES = int(
        os.environ.get("SPARK_GRAFT_SPREAD_MAX_BYTES", str(1 << 30))
    )
    # Keyed by (path, mtime, size) — same stamp as the scan cache, so a
    # rewritten fixture at the same path never serves a stale layout —
    # and bounded like it.
    _layout_cache: dict[tuple, tuple[int, int]] = {}

    def _layout(self, name: str) -> tuple[int, int]:
        """(row_groups, total_bytes) for a table path, footer-metadata only."""
        path = self.path(name)
        key = (path, self._stamp(path))
        ent = Catalog._layout_cache.get(key)
        if ent is None:
            files = (
                [path]
                if os.path.isfile(path)
                else [
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if f.endswith(".parquet")
                ]
            )
            import pyarrow.parquet as pq

            rg = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
            nbytes = sum(os.path.getsize(f) for f in files)
            ent = (rg, nbytes)
            if len(Catalog._layout_cache) >= Catalog._CACHE_MAX_ENTRIES:
                Catalog._layout_cache.pop(next(iter(Catalog._layout_cache)))
            Catalog._layout_cache[key] = ent
        return ent

    def rowcount(self, table: str) -> int:
        """Exact row count from parquet footer metadata (what a COUNT(*)
        over the scan reads anyway — no job, no scan; r12)."""
        path = self.path(table)
        files = (
            [path]
            if os.path.isfile(path)
            else [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        )
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    def spread(self, df: DataFrame, table: str, key: str) -> DataFrame:
        try:
            row_groups, nbytes = self._layout(table)
        except Exception:
            return df
        cores = self.spark.sparkContext.defaultParallelism
        if row_groups >= cores or nbytes > self._SPREAD_MAX_BYTES:
            return df
        return df.repartition(cores, df[key])

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register(self, name: str, df: DataFrame) -> None:
        """Register a DataFrame as a named table (DML-created tables,
        views, subquery results) resolvable in FROM clauses."""
        self._cache[name] = df
        # OLTP-scoped (db-written) tables, as opposed to lazy sf-dir
        # parquet scans — LIMIT-without-ORDER pins KV id order only here
        # (a global sort per bare LIMIT would be wrong at 100 TB)
        if not hasattr(self, "registered"):
            self.registered = set()
        self.registered.add(name)

    def register_edges(self, name: str, edges: DataFrame) -> None:
        """Register an edge table (columns ``in``/``out`` [+payload])."""
        self.edges[name] = edges

    def set_permission(self, name: str, perm) -> None:
        """PERMISSIONS FOR select: Column | callable(session)->Column |
        False (deny-all) | None (full access, clears)."""
        if perm is None:
            self.permissions.pop(name, None)
        else:
            self.permissions[name] = perm

    def set_auth(self, **session) -> None:
        """$auth/$session bindings seen by permission expressions."""
        self.auth = session

    def register_views(self, names: list[str] | None = None) -> None:
        """Register temp views so spark.sql() sees the same tables DuckDB does."""
        for name in names or TABLES:
            if os.path.exists(self.path(name)):
                self.table(name).createOrReplaceTempView(name)
