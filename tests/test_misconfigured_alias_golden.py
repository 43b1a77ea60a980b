"""misconfigured_configs.out + alias_non_text.out goldens (PUBLIC
reference behavior): unknown per-field config keys are IGNORED (the
index still builds and serves raw-term queries), and non-text
expression fields (pdb.alias) answer predicates only when the query
expression MATCHES the indexed expression — `i - j = 1` finds nothing
while `abs(i - j) = 1` finds every row.

Ref: pg_search/tests/pg_regress/expected/misconfigured_configs.out
     pg_search/tests/pg_regress/expected/alias_non_text.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def test_unknown_config_keys_ignored(spark):
    """text_fields='{"description": {"unknown": "value", "tokenizer":
    {"type": "keyword"}}}' builds fine; a raw term query matches."""
    docs = mock_items(spark)
    schema = IndexSchema.from_options(
        "id", {"description": {"unknown": "value",
                               "tokenizer": {"type": "keyword"}}})
    idx = build_index(docs, schema)
    m = compile_query(idx, ast.Term("description", "Sleek running shoes"))
    got = (docs.join(m.select("doc_id"), docs["id"] == F.col("doc_id"))
           .select("description", "rating", "category")
           .limit(5).collect())
    assert [tuple(r) for r in got] == \
        [("Sleek running shoes", 5, "Footwear")]


def test_alias_date_expression(spark):
    """(get_day_of_week(d)::pdb.alias('d')): the indexed expression
    answers equality on the expression's value."""
    dates = spark.createDataFrame([(1, "2025-01-01")],
                                  "id long, d string") \
        .withColumn("d", F.col("d").cast("date"))
    idx = build_index(dates, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="dow", source="dayofweek(d)",
                                 tokenizer="keyword")]))
    # 2025-01-01 is a Wednesday: ISO dow 3 (Spark dayofweek = 4,
    # Sunday-based; the indexed expression is what's queried, so the
    # test matches against the same expression's value)
    m = compile_query(idx, ast.Term("dow", "4"))
    got = dates.join(m.select("doc_id"),
                     dates["id"] == F.col("doc_id")).collect()
    assert [r["id"] for r in got] == [1]


@pytest.fixture(scope="module")
def ints(spark):
    docs = spark.createDataFrame([(1, 1, 2), (2, 2, 3), (3, 3, 4)],
                                 "id long, i int, j int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="another_name",
                                 source="abs(i - j)",
                                 tokenizer="keyword")]))
    return docs, idx


def test_bare_expression_does_not_match_indexed_abs(ints):
    """i - j = 1 must NOT use the abs(i-j) index entries: every row has
    i - j = -1, so the (heap-evaluated) predicate finds nothing."""
    docs, idx = ints
    m = compile_query(idx, ast.All()).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .filter(F.col("i") - F.col("j") == 1).collect())
    assert got == []


def test_matching_expression_uses_index(ints):
    """abs(i - j) = 1 matches the indexed expression: all 3 rows."""
    docs, idx = ints
    m = compile_query(idx, ast.Term("another_name", "1")).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"])
           .orderBy("id").collect())
    assert [(r["id"], r["i"], r["j"]) for r in got] == \
        [(1, 1, 2), (2, 2, 3), (3, 3, 4)]
