"""Export/import + sequences.

Reference: full-DB SurrealQL-text export (core/src/kvs/export.rs; streaming
import via ds.rs:1979) and named monotonic sequences
(core/src/kvs/sequences.rs, sequence::nextval core/src/fnc/sequence.rs).

Spark reality: parquet/zstd snapshots ARE the native export (a capability
superset — the reference has no columnar format); the SurrealQL-text writer
below exists for interchange with the reference.  Statements are generated
distributed (one expression per row) and only streamed to the file at the
end; at 100 TB you'd write the statement column straight back out with
df.write.text, sharded.

Sequences allocate driver-side BLOCKS (not per-row calls): nextval_block(n)
reserves [start, start+n) in one counter bump, then ids are assigned with
row_number/zipWithIndex inside the allocated range — the standard
distributed-sequence pattern (per-row global counters don't scale and the
reference itself documents batch allocation in kvs/sequences.rs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def record_to_statement(table: str, id_col: str) -> F.Column:
    """Per-row SurrealQL: INSERT INTO <tbl> <json-object>; (export.rs shape)."""
    return F.concat(
        F.lit(f"INSERT INTO {table} "),
        F.to_json(F.struct("*")),
        F.lit(";"),
    )


def export_table_surql(df: DataFrame, table: str, id_col: str, path: str) -> int:
    """Write a table as SurrealQL INSERT statements (text, one per line).
    Returns the row count."""
    df = df.drop("__present",  # engine-internal presence marker
                 *[c for c in df.columns if c.startswith("__k_")])
    stmts = df.select(record_to_statement(table, id_col).alias("stmt"))
    stmts.write.mode("overwrite").text(path)
    return df.count()


def import_table_surql(spark, path: str) -> DataFrame:
    """Read a SurrealQL-text export back into (table, record-json) rows —
    the streaming-import analogue (ds.rs:1979): parse statements
    distributed, then route per table."""
    lines = spark.read.text(path)
    pat = r"^INSERT INTO (\w+) (\{.*\});$"
    return lines.select(
        F.regexp_extract("value", pat, 1).alias("table"),
        F.regexp_extract("value", pat, 2).alias("record_json"),
    ).filter(F.col("table") != "")


def export_database_surql(db, path: str) -> dict[str, int]:
    """Full-DB export: DEFINE TABLE headers + every table's INSERTs into
    one directory (one text part-set per table; export.rs full export)."""
    import os as _os

    counts: dict[str, int] = {}
    ddl = [f"DEFINE TABLE {t};" for t in sorted(db.tables) if db._exists(t)]
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/_schema.surql", "w") as fh:
        fh.write("\n".join(ddl) + "\n")
    for t in sorted(db.tables):
        if db._exists(t):
            counts[t] = export_table_surql(
                db.table(t), t, db.tables[t].id_col, f"{path}/{t}"
            )
    return counts


def import_database_surql(db, path: str) -> dict[str, int]:
    """Full-DB import: run the schema DDL through the statement parser,
    then bulk-INSERT each table's rows DISTRIBUTED (rows never collect to
    the driver — the per-line JSON is parsed as a DataFrame and appended
    per table; only statement COUNTS come back)."""
    import os as _os

    from pyspark.sql import functions as F  # noqa: F811

    from surrealdb_spark.sql.statements import StatementRunner

    runner = StatementRunner(db.spark, db)
    schema_file = f"{path}/_schema.surql"
    if _os.path.exists(schema_file):
        for line in open(schema_file):
            line = line.strip().rstrip(";")
            if line:
                runner.run(line)
    counts: dict[str, int] = {}
    for entry in sorted(_os.listdir(path)):
        tdir = f"{path}/{entry}"
        if entry.startswith("_") or not _os.path.isdir(tdir):
            continue
        parsed = import_table_surql(db.spark, tdir).filter(
            F.col("table") == entry
        )
        sample = parsed.limit(1).collect()
        if not sample:
            continue
        # Infer the schema over ALL records (spark.read.json merges per-line
        # schemas), not just the first — heterogeneous tables would otherwise
        # drop fields absent from record #1.
        rows = db.spark.read.json(
            parsed.select("record_json").rdd.map(lambda r: r[0])
        )
        if entry not in db.tables:
            from surrealdb_spark.dml import TableDef

            db.define_table(TableDef(entry))
        db.insert(entry, rows)
        counts[entry] = rows.count()
    return counts


_SEQUENCES: dict[str, "Sequence"] = {}


def define_sequence(name: str, root: str | None = None, start: int = 1) -> "Sequence":
    """DEFINE SEQUENCE analogue — register a named counter, RESET to
    `start` (a fresh DEFINE is a new sequence, define/sequence.rs)."""
    if root is None:
        import tempfile

        root = os.path.join(tempfile.gettempdir(), "surrealdb_spark_seq")
    _SEQUENCES[name] = Sequence(root, name, start, reset=True)
    return _SEQUENCES[name]


def next_sequence_value(name: str) -> int:
    """sequence::nextval('name') — errors on undefined sequences
    (fnc/sequence.rs)."""
    if name not in _SEQUENCES:
        raise KeyError(f"The sequence '{name}' does not exist")
    return _SEQUENCES[name].nextval()


class Sequence:
    """DEFINE SEQUENCE + sequence::nextval — file-backed counter with
    block allocation."""

    def __init__(self, root: str, name: str, start: int = 1,
                 reset: bool = False):
        self.path = os.path.join(root, f"_seq_{name}.json")
        if reset or not os.path.exists(self.path):
            os.makedirs(root, exist_ok=True)
            with open(self.path, "w") as f:
                json.dump({"next": start}, f)

    def nextval(self) -> int:
        return self.nextval_block(1)

    def nextval_block(self, n: int) -> int:
        """Reserve [start, start+n); returns start."""
        with open(self.path) as f:
            state = json.load(f)
        start = state["next"]
        state["next"] = start + n
        with open(self.path, "w") as f:
            json.dump(state, f)
        return start

    def assign_ids(self, df: DataFrame, col: str = "seq_id") -> DataFrame:
        """Assign contiguous sequence ids to every row of df: one block
        reservation + partition-offset numbering (zipWithIndex shape).

        Per-partition counts → cumulative offsets (a tiny driver array) →
        per-partition row_number + offset.  The window partitions by
        spark_partition_id, so numbering parallelizes across partitions —
        never the single-partition global window that collapses the whole
        table onto one task.
        """
        dfp = df.withColumn("__pid", F.spark_partition_id()).withColumn(
            "__ord", F.monotonically_increasing_id()
        )
        counts = sorted(
            (r["__pid"], r["cnt"])
            for r in dfp.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
        )
        n = sum(c for _, c in counts)
        start = self.nextval_block(n)
        if n == 0:
            return df.withColumn(col, F.lit(None).cast("long"))
        acc, offsets = start, {}
        for p, c in counts:
            offsets[p] = acc
            acc += c
        omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        rn = F.row_number().over(W.partitionBy("__pid").orderBy("__ord")) - 1
        return (
            dfp.withColumn(col, (omap[F.col("__pid")] + rn).cast("long"))
            .drop("__pid", "__ord")
        )
