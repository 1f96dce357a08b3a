"""Analyzer stack: tokenizers BLANK/CAMEL/CLASS/PUNCT + filters
ASCII/LOWERCASE/UPPERCASE/NGRAM/EDGENGRAM/SNOWBALL/MAPPER.

Parity: core/src/sql/{tokenizer,filter}.rs; core/src/idx/ft/analyzer/.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from surrealdb_spark.pipeline.analyzer import (
    Analyzer,
    define_analyzer,
    get_analyzer,
    porter_stem,
)


def run(spark, a, s):
    return spark.range(1).select(a(F.lit(s)).alias("t")).first()["t"]


def test_tokenizers(spark):
    # punct chars are isolated TOKENS, not separators
    # (tokenizer.rs punct_role: Punctuation → IsolatedToken)
    assert run(spark, Analyzer(), "Hello, World-Wide!") == \
        ["hello", ",", "world", "-", "wide", "!"]
    assert run(spark, Analyzer(("blank", "camel"), ("lowercase",)),
               "camelCaseToken") == ["camel", "case", "token"]
    assert run(spark, Analyzer(("class",), ()), "abc123!x") == \
        ["abc", "123", "!", "x"]
    # punct splits AND drops punctuation; blank alone keeps it
    assert run(spark, Analyzer(("blank",), ()), "a,b c") == ["a,b", "c"]


def test_filters(spark):
    assert run(spark, Analyzer(("blank",), ("uppercase",)), "ab cd") == ["AB", "CD"]
    assert run(spark, Analyzer(("blank",), ("lowercase", ("ngram", 2, 3))),
               "abcd") == ["ab", "bc", "cd", "abc", "bcd"]
    assert run(spark, Analyzer(("blank",), ("lowercase", ("edgengram", 2, 4))),
               "hello a") == ["he", "hel", "hell"]
    assert run(spark, Analyzer(("blank",), ("lowercase", "ascii")),
               "Crème Brûlée") == ["creme", "brulee"]
    assert run(spark, Analyzer(("blank", "punct"),
                               ("lowercase", ("snowball", "english"))),
               "running flies nationalization") == ["run", "fli", "nation"]


def test_porter_classic_vocabulary():
    # spot checks against Porter's published vocabulary output
    cases = {"caresses": "caress", "ponies": "poni", "ties": "ti",
             "caress": "caress", "cats": "cat", "feed": "feed",
             "agreed": "agre", "plastered": "plaster", "motoring": "motor",
             "sing": "sing", "conflated": "conflat", "troubled": "troubl",
             "sized": "size", "hopping": "hop", "falli": "falli",
             "happy": "happi", "relational": "relat", "rational": "ration"}
    got = {w: porter_stem(w) for w in cases}
    assert got == cases


def test_mapper(spark, tmp_path):
    mf = tmp_path / "map.tsv"
    mf.write_text("feline\tcat\nfeline\tkitten\ncanine\tdog\n")
    a = Analyzer(("blank",), ("lowercase", ("mapper", str(mf))))
    assert run(spark, a, "Cat kitten dog bird") == \
        ["feline", "feline", "canine", "bird"]


def test_snowball_non_english_rejected():
    with pytest.raises(NotImplementedError):
        Analyzer(("blank",), (("snowball", "french"),))


def test_define_analyzer_statement(spark, tmp_path):
    from surrealdb_spark.dml import Database
    from surrealdb_spark.sql.statements import StatementRunner

    db = Database(spark, str(tmp_path))
    r = StatementRunner(spark, db)
    r.run("DEFINE ANALYZER code TOKENIZERS blank,class "
          "FILTERS lowercase,edgengram(2,5)")
    a = get_analyzer("code")
    assert run(spark, a, "getUserId42") == \
        ["ge", "get", "getu", "getus", "42"]


def test_search_analyze_fn(spark):
    from surrealdb_spark.functions.registry import REGISTRY

    define_analyzer("stemmy", ("blank", "punct"),
                    ("lowercase", ("snowball", "english")))
    got = spark.range(1).select(
        REGISTRY["search::analyze"]("stemmy", F.lit("Running, quickly!")).alias("t")
    ).first()["t"]
    assert got == ["run", ",", "quickli", "!"]
