"""tokenizer-fast-field.out golden (PUBLIC reference behavior): the
fast (columnar) representation of literal / literal_normalized / JSON
fields stores the RAW value — ORDER BY and GROUP BY see the original
string even when the index tokenizer lowercases terms, so 'The big cat'
and 'the big cat' are DISTINCT groups and sort in byte order
('Quick' < 'The' < 'the': uppercase before lowercase).

Ref: pg_search/tests/pg_regress/expected/tokenizer-fast-field.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.search import search

ROWS = [
    (1, "hello", "The big cat", '{"key": "The big cat", "value": 1}'),
    (2, "hello", "the big cat", '{"key": "the big cat", "value": 3}'),
    (3, "world", "Quick brown fox", '{"key": "Quick brown fox", "value": 2}'),
]


@pytest.fixture(scope="module")
def tokenizer_fast(spark):
    docs = spark.createDataFrame(
        ROWS, "id long, t string, t_long string, metadata string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="t", tokenizer="literal", lowercase=False),
            FieldConfig(name="t_long", tokenizer="literal_normalized",
                        filters=[("stopwords_language", "English")]),
        ]))
    return idx


def test_topk_over_literal(tokenizer_fast):
    got = search(tokenizer_fast, ast.All(), limit=5,
                 order_by=[("t", "asc"), ("doc_id", "asc")],
                 columns=["id", "t", "t_long"], with_score=False).collect()
    assert [(r["id"], r["t"]) for r in got] == \
        [(1, "hello"), (2, "hello"), (3, "world")]


def test_group_by_literal_raw(tokenizer_fast):
    got = (tokenizer_fast.docs.groupBy("t")
           .agg(F.count("*").alias("count"))
           .orderBy("t").limit(5).collect())
    assert [(r["t"], r["count"]) for r in got] == \
        [("hello", 2), ("world", 1)]


def test_topk_over_literal_normalized_is_raw_byte_order(tokenizer_fast):
    """'Quick brown fox' < 'The big cat' < 'the big cat' — the fast
    column is the RAW string even though literal_normalized lowercases
    index terms."""
    got = search(tokenizer_fast, ast.All(), limit=5,
                 order_by=[("t_long", "asc"), ("doc_id", "asc")],
                 columns=["id", "t_long"], with_score=False).collect()
    assert [r["id"] for r in got] == [3, 1, 2]
    assert [r["t_long"] for r in got] == \
        ["Quick brown fox", "The big cat", "the big cat"]


def test_group_by_literal_normalized_raw_groups(tokenizer_fast):
    """Case-variant values stay distinct groups (raw fast column)."""
    got = (tokenizer_fast.docs.groupBy("t_long")
           .agg(F.count("*").alias("count"))
           .orderBy("t_long").limit(5).collect())
    assert [(r["t_long"], r["count"]) for r in got] == \
        [("Quick brown fox", 1), ("The big cat", 1), ("the big cat", 1)]


def test_group_by_json_key_raw(tokenizer_fast):
    """GROUP BY metadata->>'key' groups raw JSON string values."""
    got = (tokenizer_fast.docs
           .withColumn("k", F.get_json_object("metadata", "$.key"))
           .groupBy("k").agg(F.count("*").alias("count"))
           .orderBy("k").limit(5).collect())
    assert [(r["k"], r["count"]) for r in got] == \
        [("Quick brown fox", 1), ("The big cat", 1), ("the big cat", 1)]
