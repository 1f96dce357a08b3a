"""Behavior tests for the value layer, FETCH (struct + array), and idiom
paths — shapes the SQL-oracle harness can't express (nested outputs).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from surrealdb_spark import values as V
from surrealdb_spark.expr.idiom import compile_idiom
from surrealdb_spark.operators.fetch import fetch, fetch_array


def test_fetch_embeds_struct(spark):
    people = spark.createDataFrame(
        [Row(id="person:1", name="ann", friend="person:2"), Row(id="person:2", name="bo", friend=None)]
    )
    out = fetch(people, "friend", people.select("id", "name"), "id").orderBy("id").collect()
    assert out[0].friend.name == "bo"
    assert out[1].friend is None  # None link stays None (left join)


def test_fetch_array_renest_preserves_order(spark):
    docs = spark.createDataFrame(
        [Row(id=1, refs=["t:3", "t:1", "t:9"]), Row(id=2, refs=[])]
    )
    target = spark.createDataFrame([Row(tid=f"t:{i}", val=i) for i in [1, 3, 9]])
    out = {
        r.id: r.refs
        for r in fetch_array(docs, "refs", ["id"], target, "tid").collect()
    }
    assert [s.val for s in out[1]] == [3, 1, 9]  # original array order kept
    assert out[2] == []


def test_idiom_optional_and_destructure(spark):
    df = spark.createDataFrame(
        [Row(doc=Row(a=Row(b=7, c="x"), arr=[[1, 2], [3]]))]
    )
    flat = compile_idiom(F.col("doc.arr"), [("flatten",)])
    dest = compile_idiom(
        F.col("doc"), [("destructure", [("a", [("field", "b")])])]
    )
    row = df.select(flat.alias("f"), dest.alias("d")).first()
    assert row.f == [1, 2, 3]
    assert row.d.a == 7


def test_variant_cross_type_order(spark):
    df = spark.createDataFrame([Row(i=i) for i in range(8)])
    m = F.col("i") % 4
    v = (
        F.when(m == 0, V.v_none())
        .when(m == 1, V.v_string(F.lit("zz")))
        .when(m == 2, V.v_bool(F.lit(True)))
        .otherwise(V.v_number(F.lit(-5.0)))
    )
    tags = [
        r.t
        for r in df.select(V.sort_key(v).alias("k"))
        .orderBy("k")
        .select(F.col("k.t").alias("t"))
        .collect()
    ]
    # None(0) < Bool(2) < Number(3) < String(4)
    assert tags == sorted(tags)
    assert tags[0] == V.TAG_NONE and tags[-1] == V.TAG_STRING


def test_variant_truthiness(spark):
    df = spark.createDataFrame([Row(x=1)])
    row = df.select(
        V.truthy(V.v_none()).alias("none_t"),
        V.truthy(V.v_bool(F.lit(True))).alias("bt"),
        V.truthy(V.v_number(F.lit(0.0))).alias("zero"),
        V.truthy(V.v_string(F.lit(""))).alias("empty"),
        V.truthy(V.v_string(F.lit("hi"))).alias("s"),
    ).first()
    assert (row.none_t, row.bt, row.zero, row.empty, row.s) == (
        False,
        True,
        False,
        False,
        True,
    )
