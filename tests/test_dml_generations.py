"""Generation-dir table rewrites (r13 optimization).

`Database._overwrite` writes each mutation's result into a fresh
``data_g<N>`` dir instead of checkpointing the whole table and truncating
the dir in place.  Contract under test:

- the current-generation pointer is derived from the dirs on disk (so
  transaction copytree backup/restore and REMOVE TABLE rmtree carry it);
- a lazy reader taken BEFORE a mutation still sees the old rows after it
  (read stability — the property the old full-table localCheckpoint
  existed to protect);
- repeated mutations keep advancing generations and reading back correctly.
"""

import os

import pytest
from pyspark.sql import functions as F

from surrealdb_spark import get_spark
from surrealdb_spark.dml import Database, TableDef


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_dml_generations")


def _db(spark, tmp_path):
    db = Database(spark, str(tmp_path))
    db.define_table(TableDef("t"))
    db.create(
        "t",
        spark.createDataFrame(
            [("t:1", 1), ("t:2", 2), ("t:3", 3)], "id string, v int"
        ),
    )
    return db


def test_reader_taken_before_mutation_is_stable(spark, tmp_path):
    db = _db(spark, tmp_path)
    snapshot = db.table("t")  # lazy plan over the pre-mutation generation
    db.update("t", {"v": F.lit(99)}, F.col("id") == "t:1")
    assert sorted(r.v for r in snapshot.collect()) == [1, 2, 3]
    assert sorted(r.v for r in db.table("t").collect()) == [2, 3, 99]


def test_generations_advance_and_read_back(spark, tmp_path):
    db = _db(spark, tmp_path)
    assert db._data("t").endswith("/data")  # create() appends in place
    db.update("t", {"v": F.col("v") + 10})
    g1 = db._data("t")
    assert g1.endswith("data_g1")
    db.delete("t", F.col("v") == 12)
    g2 = db._data("t")
    assert g2.endswith("data_g2")
    assert sorted(r.v for r in db.table("t").collect()) == [11, 13]
    # both old generations still on disk (readers may hold plans on them)
    base = os.path.dirname(g2)
    assert os.path.isdir(f"{base}/data") and os.path.isdir(g1)


def test_remove_and_redefine_resets_generations(spark, tmp_path):
    import shutil

    db = _db(spark, tmp_path)
    db.update("t", {"v": F.lit(0)})
    assert db._data("t").endswith("data_g1")
    shutil.rmtree(f"{db.root}/t")  # REMOVE TABLE path (statements.py)
    db.define_table(TableDef("t"))
    assert db._data("t").endswith("/data")
    assert not db._exists("t")
    db.create("t", spark.createDataFrame([("t:9", 9)], "id string, v int"))
    assert [r.v for r in db.table("t").collect()] == [9]


def test_upsert_and_insert_roundtrip_across_generations(spark, tmp_path):
    db = _db(spark, tmp_path)
    db.upsert(
        "t", spark.createDataFrame([("t:2", 20), ("t:4", 40)], "id string, v int")
    )
    assert dict((r.id, r.v) for r in db.table("t").collect()) == {
        "t:1": 1, "t:2": 20, "t:3": 3, "t:4": 40,
    }
    db.insert(
        "t",
        spark.createDataFrame([("t:5", 5)], "id string, v int"),
    )
    assert sorted(r.v for r in db.table("t").collect()) == [1, 3, 5, 20, 40]
