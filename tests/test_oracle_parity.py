"""Driver-gate replica: every oracled suite query must match DuckDB exactly.

Runs at sf0.001 for speed in the default test loop; the standalone CLI
(`python -m surrealdb_spark.testing --sf /root/testdata/sf0.01`) covers the
driver's actual scale factor.
"""

from __future__ import annotations

import pytest

from surrealdb_spark import suite
from surrealdb_spark.testing import compare_frames, duckdb_run


def _names():
    return sorted(suite.oracle_sql())


@pytest.mark.parametrize("name", _names())
def test_parity(spark, sf_dir, name):
    got = suite.queries()[name](spark, sf_dir).toPandas()
    want = duckdb_run(suite.oracle_sql()[name], sf_dir)
    compare_frames(name, got, want)


def test_all_queries_run(spark, sf_dir):
    """Every queries() entry (oracled or not) executes and returns a schema."""
    for name, fn in suite.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
