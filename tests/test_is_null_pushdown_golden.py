"""is_null_pushdown.out golden (PUBLIC reference behavior): IS NULL /
IS NOT NULL predicates on indexed fields push into the search — the
soft-delete pattern.  IS NOT NULL = Exists(field); IS NULL = must_not
Exists.  Counts are complementary, compose with attribute filters, and
a partial index declared WHERE deleted_at IS NULL serves the same
query from its pre-filtered corpus.

Corpus: ids 1..300 have NULL deleted_at, 301..1000 non-NULL;
category_id = id % 10.

Ref: pg_search/tests/pg_regress/expected/is_null_pushdown.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def products(spark):
    rows = [(i, i % 10, None if i <= 300 else "2024-01-01 00:00:00")
            for i in range(1, 1001)]
    docs = spark.createDataFrame(
        rows, "id long, category_id int, deleted_at string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="deleted_at",
                                 tokenizer="datetime")]))
    return idx, docs


def test_is_not_null(products):
    idx, _ = products
    assert compile_query(idx, ast.Exists("deleted_at")).count() == 700


def test_is_null(products):
    idx, _ = products
    node = ast.Boolean(must=[ast.All()],
                       must_not=[ast.Exists("deleted_at")])
    assert compile_query(idx, node).count() == 300


def test_counts_complementary(products):
    idx, _ = products
    null_n = compile_query(
        idx, ast.Boolean(must=[ast.All()],
                         must_not=[ast.Exists("deleted_at")])).count()
    not_null_n = compile_query(idx, ast.Exists("deleted_at")).count()
    total = compile_query(idx, ast.All()).count()
    assert (null_n, not_null_n, total) == (300, 700, 1000)


def test_is_null_with_attribute_filter(products):
    # deleted_at IS NULL AND category_id = 5 -> ids 5,15,...,295 = 30
    idx, docs = products
    node = ast.Boolean(must=[ast.All()],
                       must_not=[ast.Exists("deleted_at")])
    m = compile_query(idx, node)
    got = (m.join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
           .filter(F.col("category_id") == 5).count())
    assert got == 30


def test_partial_index_where_is_null(products):
    # PART 2: the index itself is declared WHERE deleted_at IS NULL —
    # its corpus is pre-filtered, so All() + category filter answers
    # the query without re-checking the NULL predicate
    _, docs = products
    pidx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category_id", tokenizer="raw",
                                 source="cast(category_id as string)")],
        predicate="deleted_at IS NULL"))
    assert compile_query(pidx, ast.All()).count() == 300
    m = compile_query(pidx, ast.Term("category_id", "5"))
    assert m.count() == 30
