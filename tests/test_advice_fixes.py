"""Regression tests for the five carried-over ADVICE defects (round-2/3).

Each test pins one named fix:
  1. LocalBucket key escape via sibling-dir prefix (filebucket.py `_p`)
  2. `@@` MATCHES false positive via empty split tokens (expr/operators.py)
  3. `_decompose` array arm off-by-one (sql/compiler.py)
  4. import schema inferred from first record only (export.py)
  5. UNIQUE index unenforced on update/upsert-update (dml.py)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from surrealdb_spark.dml import Database, MutationError, TableDef
from surrealdb_spark.expr import operators as ops
from surrealdb_spark.pipeline.filebucket import LocalBucket


def test_bucket_key_cannot_escape_to_sibling_dir(tmp_path):
    root = tmp_path / "bkt"
    evil = tmp_path / "bkt-evil"
    evil.mkdir()
    b = LocalBucket("bkt", str(root))
    # "../bkt-evil/x" resolves to a path that string-prefix-matches
    # str(root) ("/…/bkt" is a prefix of "/…/bkt-evil") — must still raise.
    with pytest.raises(ValueError):
        b.put("../bkt-evil/x", b"pwn")
    with pytest.raises(ValueError):
        b.get("../../etc/passwd")
    assert not (evil / "x").exists()
    # sane keys still work
    assert b.put("a/b.txt", b"ok").endswith("/a/b.txt")
    assert b.get("a/b.txt") == b"ok"


def test_matches_ignores_empty_tokens(spark):
    df = spark.createDataFrame([Row(t="hello world.")])
    got = df.select(
        ops.matches(F.col("t"), F.lit("foo.")).alias("bad"),
        ops.matches(F.col("t"), F.lit("world!")).alias("good"),
        ops.matches(F.col("t"), F.lit("...")).alias("punct_only"),
    ).first()
    assert got["bad"] is False  # shared '' token must not count as a match
    assert got["good"] is True
    assert got["punct_only"] is False


def test_array_literal_of_aggregates_in_group_by(spark, sf_dir):
    from surrealdb_spark.sdk import Surreal

    db = Surreal(spark, sf_dir)
    got = db.query(
        "SELECT o_orderpriority, "
        "[math::min(o_totalprice), math::max(o_totalprice)] AS mm "
        "FROM orders GROUP BY o_orderpriority"
    ).collect()
    assert len(got) == 5
    for r in got:
        lo, hi = r["mm"]
        assert lo <= hi


def test_import_merges_schema_over_all_records(spark, tmp_path):
    from surrealdb_spark.export import export_database_surql, import_database_surql

    src = Database(spark, str(tmp_path / "src"))
    src.define_table(TableDef("person"))
    # record #1 has no "email"; record #2 introduces it — import must keep it
    src.create(
        "person",
        spark.createDataFrame(
            [("person:1", "Ann", None), ("person:2", "Bob", "bob@x.io")],
            "id string, name string, email string",
        ),
    )
    out = str(tmp_path / "dump")
    export_database_surql(src, out)
    dst = Database(spark, str(tmp_path / "dst"))
    import_database_surql(dst, out)
    rows = {r["id"]: r for r in dst.table("person").collect()}
    assert "email" in dst.table("person").columns
    assert rows["person:2"]["email"] == "bob@x.io"


@pytest.fixture()
def udb(spark, tmp_path):
    d = Database(spark, str(tmp_path / "u"))
    d.define_table(TableDef("user", unique_indexes=[["email"]]))
    d.create(
        "user",
        spark.createDataFrame(
            [("user:1", "a@x.io"), ("user:2", "b@x.io")],
            "id string, email string",
        ),
    )
    return d


def test_unique_enforced_on_update(spark, udb):
    with pytest.raises(MutationError):
        udb.update(
            "user", {"email": F.lit("a@x.io")}, where=F.col("id") == "user:2"
        )
    # non-colliding update still fine
    udb.update("user", {"email": F.lit("c@x.io")}, where=F.col("id") == "user:2")
    assert udb.table("user").filter(F.col("email") == "c@x.io").count() == 1


def test_unique_enforced_on_upsert_update(spark, udb):
    with pytest.raises(MutationError):
        udb.upsert(
            "user",
            spark.createDataFrame([("user:2", "a@x.io")], "id string, email string"),
        )


# ---- round-5 ADVICE fixes ------------------------------------------------


def test_reference_on_delete_defaults_to_ignore(spark, tmp_path):
    """Bare REFERENCE must default ON DELETE to IGNORE
    (syn/parser/stmt/parts.rs:497), not REJECT."""
    from surrealdb_spark.sql.statements import StatementRunner

    db = Database(spark, str(tmp_path))
    r = StatementRunner(spark, db)
    r.run("DEFINE TABLE author")
    r.run("DEFINE TABLE book")
    r.run("DEFINE FIELD wrote ON author TYPE option<record<book>> REFERENCE")
    r.run("CREATE book:1 SET title = 'b'")
    r.run("CREATE author:1 SET wrote = book:1")
    # with IGNORE default this delete succeeds silently
    r.run("DELETE book:1")
    assert db.table("book").count() == 0


def test_block_returns_return_value(spark, tmp_path):
    """{ LET $x = 1; RETURN $x } must yield 1 (expr/block.rs)."""
    from surrealdb_spark.sql.statements import StatementRunner

    db = Database(spark, str(tmp_path))
    r = StatementRunner(spark, db)
    assert r.run_block("LET $x = 1; RETURN $x") == 1
    # RETURN exits early — trailing statements don't override it
    assert r.run_block("LET $x = 2; RETURN $x; RETURN 99") == 2


def test_delete_return_value_on_undefined_table(spark, tmp_path):
    """DEFINE TABLE t; DELETE t RETURN VALUE id must not crash on the
    empty-table early-return path (dml.py capture population)."""
    from surrealdb_spark.sql.statements import StatementRunner

    db = Database(spark, str(tmp_path))
    r = StatementRunner(spark, db)
    r.run("DEFINE TABLE t")
    out = r.run("DELETE t RETURN VALUE id")
    assert out is None or out.count() == 0
    out2 = r.run("UPDATE t SET x = 1 RETURN VALUE id")
    assert out2 is None or out2.count() == 0


def test_unknown_type_truthiness_nonempty_string_truthy(spark):
    """Value::is_truthy (val/mod.rs:152): any non-empty string is truthy,
    including 'false' and '0'; empty string is falsy."""
    from surrealdb_spark.sql.compiler import _truthy_col

    df = spark.createDataFrame(
        [("false",), ("0",), ("0.0",), ("",), ("x",), (None,)], "v string"
    )
    got = [r[0] for r in df.select(_truthy_col(F.col("v"), None)).collect()]
    assert got == [True, True, True, False, True, False]
    # genuinely numeric/boolean runtime types still map 0/false → falsy
    dfn = spark.createDataFrame([(0,), (7,), (None,)], "v bigint")
    gotn = [r[0] for r in dfn.select(_truthy_col(F.col("v"), None)).collect()]
    assert gotn == [False, True, False]
    dfb = spark.createDataFrame([(False,), (True,)], "v boolean")
    gotb = [r[0] for r in dfb.select(_truthy_col(F.col("v"), None)).collect()]
    assert gotb == [False, True]
