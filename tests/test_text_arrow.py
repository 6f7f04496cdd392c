"""Differential pin for the Arrow-vectorized doc-feature derive
(operators/text_arrow.py): bit-exact against the expression spellings it
replaces in q_crawl_to_shards' cleaned-corpus checkpoint.
"""

import pytest
from pyspark.sql import functions as F

from ironbeam_spark.functions.text import token_count
from ironbeam_spark.operators.dedup import hashed_word_shingles
from ironbeam_spark.operators.text_arrow import doc_dedup_features_arrow

SF_SMOKE = "/root/testdata/sf0.001"


def _expr_frame(df, id_col, text_col, n):
    return df.select(
        id_col,
        F.md5(text_col).alias("doc_md5"),
        token_count(text_col).alias("n_tokens"),
        hashed_word_shingles(text_col, n).alias("shingles"),
    )


def _assert_equivalent(df, id_col="doc_id", text_col="text", n=3):
    a = _expr_frame(df, id_col, text_col, n)
    b = doc_dedup_features_arrow(df, id_col, text_col, shingle_words=n)
    assert a.schema == b.schema, f"{a.schema} != {b.schema}"
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"{diff} differing rows between expression and Arrow"


def test_corpus_differential(spark):
    """Full documents table: every row identical between paths."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    _assert_equivalent(docs)


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_edge_cases_differential(spark, n):
    """The inputs where split/md5/fold semantics could diverge:
    null, empty, all-spaces, fewer tokens than n, space runs (empty
    tokens dropped), tabs/newlines INSIDE tokens (not separators),
    unicode multibyte, repeated shingles (distinct), single token."""
    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "one"),
        (5, "one two"),
        (6, "a  b   c    d"),
        (7, "tab\there and\nnewline tokens stay joined"),
        (8, "café naïve 中文 \U0001f600 mix"),
        (9, "x y x y x y x y x y"),
        (10, " leading and trailing "),
        (11, "a b c a b c a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _assert_equivalent(df, n=n)


def test_null_text_contract(spark):
    """NULL text: NULL md5/n_tokens but an EMPTY (not null) shingle
    array — the expression contract the consumers filter on."""
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = doc_dedup_features_arrow(df, "doc_id", "text").collect()[0]
    assert row.doc_md5 is None
    assert row.n_tokens is None
    assert row.shingles == []


def test_id_type_passthrough(spark):
    """Non-long id columns survive with their declared type."""
    df = spark.createDataFrame(
        [("k1", "alpha beta gamma delta")], "k string, text string"
    )
    out = doc_dedup_features_arrow(df, "k", "text")
    assert out.schema["k"].dataType.simpleString() == "string"
    assert out.collect()[0].k == "k1"
