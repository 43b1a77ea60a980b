"""cte-tokenizer-cast.out golden (PUBLIC reference behavior): CTE
composition over a search-filtered scan with an inline tokenizer cast
(``description::pdb.simple``) — direct query, bare CTE, CTE with
LIMIT, CTE with ORDER BY, and nested CTEs all return the same shoes
rows (3, 4, 5) from the canonical mock_items corpus.

Ref: pg_search/tests/pg_regress/expected/cte-tokenizer-cast.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

WANT = [(3, "Sleek running shoes"), (4, "White jogging shoes"),
        (5, "Generic shoes")]


@pytest.fixture(scope="module")
def simple_idx(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description",
                                 tokenizer="simple")]))
    return idx, docs


def _shoes(idx, docs):
    m = compile_query(idx, ast.Match("description", "shoes")) \
        .select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_direct_query(simple_idx):
    idx, docs = simple_idx
    rows = (_shoes(idx, docs).orderBy("id")
            .select("id", "description").collect())
    assert [(r[0], r[1]) for r in rows] == WANT


def test_cte_shapes(simple_idx, spark):
    idx, docs = simple_idx
    _shoes(idx, docs).createOrReplaceTempView("q")
    # bare CTE
    got = [(r[0], r[1]) for r in spark.sql(
        "SELECT id, description FROM q ORDER BY id").collect()]
    assert got == WANT
    # CTE with LIMIT
    got = [(r[0], r[1]) for r in spark.sql(
        "WITH ql AS (SELECT * FROM q LIMIT 10) "
        "SELECT id, description FROM ql ORDER BY id").collect()]
    assert got == WANT
    # CTE with ORDER BY inside
    got = [(r[0], r[1]) for r in spark.sql(
        "WITH qo AS (SELECT * FROM q ORDER BY rating) "
        "SELECT id, description FROM qo ORDER BY id").collect()]
    assert got == WANT
    # nested CTEs
    got = [(r[0], r[1]) for r in spark.sql(
        "WITH q1 AS (SELECT * FROM q), "
        "q2 AS (SELECT * FROM q1 WHERE rating >= 0) "
        "SELECT id, description FROM q2 ORDER BY id").collect()]
    assert got == WANT
