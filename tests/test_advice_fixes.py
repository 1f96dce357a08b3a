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
    # sane keys still work (put returns None — fnc/file.rs Value::None)
    assert b.put("a/b.txt", b"ok") is None
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


def test_return_expr_unknown_field_on_empty_table(spark, tmp_path):
    """UPDATE/DELETE on an empty or undefined table with RETURN
    expressions over fields the id-only image doesn't carry must return
    [] like the reference, not raise AnalysisException
    (sql/statements.py _ret_expr_static empty-image short-circuit)."""
    from surrealdb_spark.sql.statements import StatementRunner

    db = Database(spark, str(tmp_path))
    r = StatementRunner(spark, db)
    # undefined table entirely
    assert r.run("UPDATE t SET x = 1 RETURN VALUE x").count() == 0
    assert r.run("UPDATE t SET x = 1 RETURN x, y AS why").count() == 0
    assert r.run("DELETE t RETURN VALUE x").count() == 0
    # defined but empty table
    r.run("DEFINE TABLE e")
    assert r.run("UPDATE e SET v = 2 RETURN VALUE v * 2").count() == 0


def test_dataset_return_block_mutations_materialize(spark, tmp_path):
    """_materialize_dataset must not drop data produced by a top-level
    RETURN { ...mutations... } block (golden.py _replay_dataset)."""
    from surrealdb_spark.golden import _materialize_dataset

    ds = tmp_path / "ds.surql"
    ds.write_text(
        ";\n".join(f"CREATE seed:{i} SET n = {i}" for i in range(6))
        + ";\nRETURN { CREATE extra:1 SET v = 42; };\nRETURN NONE;\n"
    )
    entry = _materialize_dataset(spark, str(ds))
    assert entry["heavy"]
    import os

    assert os.path.isdir(os.path.join(entry["root"], "extra"))


def test_driver_caps_fail_loudly(spark, tmp_path):
    """The four driver-side materialization sites must raise above the
    10k cap instead of silently dropping rows (statements.py
    _bounded_collect)."""
    import pytest as _pt

    from surrealdb_spark.sql import statements as S

    df = spark.range(S._OLTP_CAP + 5).select(
        F.concat(F.lit("t:"), F.col("id")).alias("id"))
    with _pt.raises(MutationError, match="driver materialization cap"):
        S._bounded_collect(df, "test site")
    # under the cap: plain rows back
    assert len(S._bounded_collect(df.limit(10), "test site")) == 10


def test_event_fast_path_is_distributed(spark, tmp_path):
    """A single simple CREATE...SET THEN body runs as one DataFrame
    insert (statements.py _event_fast_path), so it works above the
    driver-loop cap."""
    from surrealdb_spark.sql import statements as S
    from surrealdb_spark.sql.statements import StatementRunner

    db = Database(spark, str(tmp_path))
    r = StatementRunner(spark, db)
    r.run("DEFINE TABLE user")
    r.run("DEFINE EVENT log ON TABLE user WHEN $event = 'CREATE' "
          "THEN (CREATE log SET who = $after.name, ev = $event)")
    r.run("CREATE user:1 SET name = 'alice'")
    rows = r.run("SELECT who, ev FROM log").collect()
    assert [(x["who"], x["ev"]) for x in rows] == [("alice", "CREATE")]
    # the fast path recognizes the shape without collecting matched rows
    hook_tbl = db.tables["user"]
    assert hook_tbl.events, "event hook registered"
    matched = spark.range(3).select(
        F.concat(F.lit("user:"), F.col("id")).alias("id"),
        F.concat(F.lit("u"), F.col("id")).alias("name"))
    binds = {"event": F.lit("CREATE"),
             "after": F.struct(F.col("id"), F.col("name")),
             "before": F.lit(None), "value": F.lit(None), "this": F.lit(None)}
    assert r._event_fast_path(
        matched, binds, ["(CREATE log SET who = $after.name, ev = $event)"])
    assert r.run("SELECT count() FROM log GROUP ALL").collect()[0][0] == 4


def test_quadratic_primitives_guarded(spark):
    """jaccard_pairs / cosine_pairs refuse to run without
    allow_quadratic=True (the LSH paths are the scale-safe defaults)."""
    import pytest as _pt

    from surrealdb_spark.pipeline.dedup import jaccard_pairs
    from surrealdb_spark.pipeline.similarity import cosine_pairs

    docs = spark.createDataFrame([("d1", "a b"), ("d2", "a b")],
                                 "doc_id string, text string")
    with _pt.raises(ValueError, match="allow_quadratic"):
        jaccard_pairs(docs, "doc_id", "text", 0.9)
    assert jaccard_pairs(docs, "doc_id", "text", 0.9,
                         allow_quadratic=True).count() == 1
    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [1.0, 0.0])],
                                "vec_id bigint, embedding array<double>")
    with _pt.raises(ValueError, match="allow_quadratic"):
        cosine_pairs(emb, "vec_id", "embedding", 0.5)
    assert cosine_pairs(emb, "vec_id", "embedding", 0.5,
                        allow_quadratic=True).count() == 1


def test_asof_tiebreak_overlapping_value_cols(spark):
    """r13: multiple value columns with a tiebreak that is itself a value
    column — every carried column must come from the SAME winning right row
    (the max under the tiebreak order), not from a row picked against
    already-carried values."""
    from surrealdb_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "k string, lts int")
    # Two right rows tied at ts=5: tiebreak v asc → (v=2, o='x') wins.
    right = spark.createDataFrame(
        [("k", 5, 1, "y"), ("k", 5, 2, "x")], "k string, rts int, v int, o string"
    )
    out = asof_join(
        left, right, ["k"], "lts", "rts", ["v", "o"], right_tiebreak=["v"]
    ).collect()
    assert len(out) == 1
    assert out[0]["v_asof"] == 2 and out[0]["o_asof"] == "x"


def test_layout_cache_invalidated_on_rewrite(spark, tmp_path):
    """r13: spread()'s layout cache is stamped by (mtime, size) — rewriting
    a fixture at the same path must not serve the stale layout."""
    from surrealdb_spark.catalog import Catalog

    p = str(tmp_path / "orders.parquet")
    spark.range(10).toDF("o_orderkey").write.mode("overwrite").parquet(p)
    cat = Catalog(spark, str(tmp_path))
    rg1, b1 = cat._layout("orders")
    import os as _os
    import time as _time

    _time.sleep(0.01)
    spark.range(5000).toDF("o_orderkey").repartition(4).write.mode(
        "overwrite"
    ).parquet(p)
    # force a distinct mtime stamp even on coarse filesystems
    _os.utime(
        sorted(
            _os.path.join(p, f) for f in _os.listdir(p) if f.endswith(".parquet")
        )[0]
    )
    rg2, b2 = cat._layout("orders")
    assert (rg2, b2) != (rg1, b1)


def test_minhash_array_verify_equals_exploded_join(spark):
    """r13: the exact-Jaccard verify counts the word intersection in-row
    via size(array_intersect(ws1, ws2)) instead of exploding every
    candidate by its word list.  On a corpus with near-dups, exact dups,
    disjoint docs and a sub-threshold pair, the pair set and every
    jaccard value must equal a direct all-pairs recompute."""
    from itertools import combinations

    from surrealdb_spark.pipeline.dedup import minhash_lsh_pairs

    corpus = {
        "d1": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "d2": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "d3": "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        "d4": "one two three four five six seven eight nine ten",
        "d5": "one two three four five six seven eight nine eleven",
        "d6": "totally disjoint words only here now",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id string, text string")
    threshold = 0.8
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold,
                                   n_hashes=12, bands=4).collect()
    }
    # ground truth: exact Jaccard over all pairs (LSH with 4 bands can
    # only MISS pairs, never invent them; at these similarities >= 0.8
    # every qualifying pair shares at least one full band)
    sets = {k: set(v.split()) for k, v in corpus.items()}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / (len(sets[a]) + len(sets[b]) - inter)
        if jac >= threshold:
            want[(a, b)] = jac
    assert set(got) == set(want), (got, want)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_jaccard_pairs_prefix_filter_exact(spark):
    """r13: jaccard_pairs generates candidates from rarity-ordered prefix
    tokens (AllPairs prefix principle) instead of the full token self-join.
    The filter must be EXACT — every brute-force pair at each threshold,
    with the identical jaccard value, including docs whose rare prefix
    tokens overlap nothing and near-identical docs differing by one word."""
    from itertools import combinations

    from surrealdb_spark.pipeline.dedup import jaccard_pairs

    corpus = {
        "d01": "alpha beta gamma delta epsilon zeta",
        "d02": "alpha beta gamma delta epsilon eta",    # 5/7 with d01
        "d03": "alpha beta gamma delta epsilon zeta",   # == d01
        "d04": "theta iota kappa",
        "d05": "theta iota kappa lambda",               # 3/4 with d04
        "d06": "mu nu xi omicron pi rho sigma tau",
        "d07": "mu nu xi omicron pi rho sigma upsilon", # 7/9 with d06
        "d08": "alpha theta mu",                        # hot words only
        "d09": "phi chi psi omega",
        "d10": "phi chi psi omega phi chi",             # dup words in text
    }
    docs = spark.createDataFrame(list(corpus.items()),
                                 "doc_id string, text string")
    sets = {k: set(v.split()) for k, v in corpus.items()}
    for t in (0.99, 0.75, 0.6, 0.3):
        got = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in jaccard_pairs(docs, "doc_id", "text", t,
                                   allow_quadratic=True).collect()
        }
        want = {}
        for a, b in combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if jac >= t:
                want[(a, b)] = jac
        assert set(got) == set(want), (t, got, want)
        for k, v in want.items():
            assert got[k] == v, (t, k, got[k], v)
