"""issue_2585.out golden (PUBLIC reference behavior): IS NULL /
IS NOT NULL / IS FALSE predicates over TEXT[] array, JSONB and boolean
columns combined with a search predicate — rows with NULLs in
non-searched columns must filter correctly.

Ref: pg_search/tests/pg_regress/expected/issue_2585.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, "Sample content 1", ["Title 1", "Title 2"], '{"key": "value1"}',
     False),
    (2, None, None, None, True),
    (3, "Another content", ["Title 3"], '{"key": "value2"}', False),
    (4, "Content with null titles", None, '{"key": "value3"}', False),
    (5, None, ["Title 4", "Title 5"], None, False),
    (6, "Content with null metadata", ["Title 6"], None, False),
    (7, "All fields present", None, None, False),
    (8, None, None, None, True),
]


@pytest.fixture(scope="module")
def nulls(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, content string, titles array<string>, "
              "metadata string, is_null boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="content")],
        boolean_fields=["is_null"]))
    return docs, idx


def _matched(nulls_fix, term):
    docs, idx = nulls_fix
    m = compile_query(idx, ast.Parse(term, field="content")) \
        .select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_not_null_combination(nulls):
    got = (_matched(nulls, "content")
           .filter(F.col("titles").isNotNull()
                   & F.col("metadata").isNotNull()
                   & F.col("is_null").isNotNull())
           .orderBy("id").collect())
    assert [(r["id"], r["content"]) for r in got] == [
        (1, "Sample content 1"), (3, "Another content")]


def test_null_combination_is_false(nulls):
    got = (_matched(nulls, "fields")
           .filter(F.col("titles").isNull() & F.col("metadata").isNull()
                   & (F.col("is_null") == False))  # noqa: E712
           .orderBy("id").collect())
    assert [(r["id"], r["content"]) for r in got] == [
        (7, "All fields present")]
