"""Direction variants + range values — paths the suite oracles don't hit."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from surrealdb_spark.expr.operators import range_contains, range_struct
from surrealdb_spark.operators.graph import graph_hop, recurse


def _edges(spark):
    rows = [Row(**{"in": "n:1", "out": "n:2"}), Row(**{"in": "n:2", "out": "n:3"})]
    return spark.createDataFrame(rows)


def test_graph_hop_both_directions(spark):
    start = spark.createDataFrame([Row(id="n:2")])
    both = {r.nbr for r in graph_hop(start, _edges(spark), "both").collect()}
    assert both == {"n:1", "n:3"}  # out to n:3, in from n:1


def test_recurse_inbound(spark):
    start = spark.createDataFrame([Row(id="n:3")])
    got = {(r.node, r.depth) for r in recurse(start, _edges(spark), 1, 3, "in").collect()}
    assert got == {("n:2", 1), ("n:1", 2)}


def test_recurse_cycle_terminates(spark):
    rows = [Row(**{"in": "c:1", "out": "c:2"}), Row(**{"in": "c:2", "out": "c:1"})]
    edges = spark.createDataFrame(rows)
    start = spark.createDataFrame([Row(id="c:1")])
    got = {(r.node, r.depth) for r in recurse(start, edges, 1, 10).collect()}
    # visited set stops the loop: c:2 at depth 1; c:1 never re-emitted
    assert got == {("c:2", 1)}


def test_range_values(spark):
    df = spark.range(1).select(
        range_contains(range_struct(F.lit(1), F.lit(5)), F.lit(5)).alias("excl"),
        range_contains(range_struct(F.lit(1), F.lit(5), end_incl=True), F.lit(5)).alias("incl"),
        range_contains(range_struct(F.lit(1), F.lit(5)), F.lit(1)).alias("lo"),
    )
    row = df.first()
    assert (row.excl, row.incl, row.lo) == (False, True, True)
