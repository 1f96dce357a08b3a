from __future__ import annotations

import json

from pyspark.sql import Row

from surrealdb_spark.export import (
    Sequence,
    export_table_surql,
    import_table_surql,
)


def test_export_import_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(id="person:1", name="ann", age=30), Row(id="person:2", name="bo", age=9)]
    )
    out = f"{tmp_path}/export"
    assert export_table_surql(df, "person", "id", out) == 2
    back = import_table_surql(spark, out).collect()
    assert len(back) == 2
    assert all(r.table == "person" for r in back)
    recs = sorted(json.loads(r.record_json)["id"] for r in back)
    assert recs == ["person:1", "person:2"]


def test_sequence_blocks(spark, tmp_path):
    seq = Sequence(str(tmp_path), "ticket")
    assert seq.nextval() == 1
    assert seq.nextval_block(10) == 2
    assert seq.nextval() == 12
    df = spark.range(5)
    got = sorted(r.seq_id for r in Sequence(str(tmp_path), "ticket").assign_ids(df).collect())
    assert got == [13, 14, 15, 16, 17]


def test_full_db_export_import_roundtrip(spark, tmp_path):
    from surrealdb_spark.dml import Database, TableDef
    from surrealdb_spark.export import export_database_surql, import_database_surql

    src = Database(spark, str(tmp_path / "src"))
    src.define_table(TableDef("person"))
    src.define_table(TableDef("city"))
    src.create("person", spark.createDataFrame(
        [("person:1", "Ann", 31), ("person:2", "Bob", 28)],
        "id string, name string, age long"))
    src.create("city", spark.createDataFrame(
        [("city:1", "Oslo")], "id string, name string"))

    out = str(tmp_path / "dump")
    counts = export_database_surql(src, out)
    assert counts == {"person": 2, "city": 1}

    dst = Database(spark, str(tmp_path / "dst"))
    got = import_database_surql(dst, out)
    assert got == {"person": 2, "city": 1}
    rows = {r["id"]: r["name"] for r in dst.table("person").collect()}
    assert rows == {"person:1": "Ann", "person:2": "Bob"}
    assert dst.table("city").count() == 1
