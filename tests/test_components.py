from __future__ import annotations

from pyspark.sql import Row

from surrealdb_spark.pipeline.components import connected_components, dedup_groups


def test_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [Row(id1=1, id2=2), Row(id1=2, id2=3), Row(id1=3, id2=4), Row(id1=10, id2=11)]
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_groups_assigns_canonicals(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in [1, 2, 3, 7]])
    pairs = spark.createDataFrame([Row(id1=2, id2=3)])
    got = {r.doc_id: r.canonical for r in dedup_groups(docs, pairs, "doc_id").collect()}
    assert got == {1: 1, 2: 2, 3: 2, 7: 7}
    keep = [k for k, v in got.items() if k == v]
    assert sorted(keep) == [1, 2, 7]  # one survivor per cluster + singletons
