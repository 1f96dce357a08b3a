"""SDK ↔ SurrealQL equivalence: both entry points produce the same IR and
the same results (the reference's shared-IR architecture, SURVEY §3)."""

from __future__ import annotations

from surrealdb_spark.sdk import Surreal
from surrealdb_spark.sql.parser import parse_select

SF = "/root/testdata/sf0.001"


def test_sdk_matches_surql_results(spark):
    db = Surreal(spark, SF)
    fluent = (
        db.table("orders")
        .select("o_orderkey", "o_totalprice")
        .where("o_totalprice > $min")
        .order_by("o_totalprice", desc=True)
        .order_by("o_orderkey")
        .limit(10)
        .bind(min=300000)
        .run()
        .collect()
    )
    text = db.query(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > $min "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
        min=300000,
    ).collect()
    assert fluent == text and len(fluent) == 10


def test_sdk_ir_equals_parsed_ir(spark):
    db = Surreal(spark, SF)
    ir = (
        db.table("orders")
        .select("o_orderkey", "o_totalprice AS price")
        .where("o_orderstatus = 'F'")
        .group_by("o_orderpriority")
        .to_surql_ir()
    )
    parsed = parse_select(
        "SELECT o_orderkey, o_totalprice AS price FROM orders "
        "WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"
    )
    assert ir.fields == parsed.fields
    assert ir.where == parsed.where
    assert ir.group == parsed.group
    assert ir.sources == parsed.sources


def test_sdk_aggregates_and_value(spark):
    db = Surreal(spark, SF)
    row = (
        db.table("orders")
        .select("count() AS n", "math::max(o_totalprice) AS mx")
        .group_all()
        .run()
        .first()
    )
    assert row.n > 0 and row.mx > 0
    vals = db.table("region").value("r_name").run().collect()
    assert len(vals) == 5 and vals[0].value is not None
