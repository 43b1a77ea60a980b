"""subquery_in_where_scale.out golden (PUBLIC reference behavior,
table replicated inline): the paging-string-max benchmark pattern at
10k rows — a keyset lower bound from a scalar subquery over a metadata
table, paged ascending and descending, plus the surviving count (5001).

Ref: pg_search/tests/pg_regress/expected/subquery_in_where_scale.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def pages(spark):
    docs = spark.createDataFrame(
        [(f"page-{i:07d}", f"content for page {i}")
         for i in range(1, 10001)],
        "id string, content string")
    meta = spark.createDataFrame(
        [("pages-row-id-max", "page-0005000")], "name string, value string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    return idx, docs, meta


def _bounded(idx, docs, meta):
    m = compile_query(idx, ast.All()).select("doc_id")
    d = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
    cur = (meta.filter(F.col("name") == "pages-row-id-max")
           .select(F.col("value").alias("cur")))
    return (d.crossJoin(F.broadcast(cur))
            .filter(F.col("id") >= F.col("cur")))


def test_asc_page(pages):
    idx, docs, meta = pages
    rows = (_bounded(idx, docs, meta).orderBy(F.col("id").asc())
            .limit(100).select("id").collect())
    assert rows[0][0] == "page-0005000"
    assert rows[-1][0] == "page-0005099"
    assert len(rows) == 100


def test_count(pages):
    idx, docs, meta = pages
    assert _bounded(idx, docs, meta).count() == 5001


def test_desc_page(pages):
    idx, docs, meta = pages
    rows = (_bounded(idx, docs, meta).orderBy(F.col("id").desc())
            .limit(100).select("id").collect())
    assert rows[0][0] == "page-0010000"
    assert rows[-1][0] == "page-0009901"
    assert len(rows) == 100
