"""segmented_topk.out golden (PUBLIC reference behavior, tables
replicated inline): ORDER BY a deferred string column + LIMIT K over
an IN-subquery semi-join — per-segment top-k pruning must never drop
surviving rows (Spark analog: TakeOrderedAndProject's per-partition
top-k + merge).  K spans maximum pruning (1), a page (3), both
directions, K > total, and a numeric sort key.

Corpus: 100 files round-robined over 10 documents; the searched
category matches the 5 odd documents, so the surviving files are the
50 odd ids.

Ref: pg_search/tests/pg_regress/expected/segmented_topk.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

DOCS = [(f"doc-{i:02d}",
         ("PROJECT_ALPHA" if i % 2 == 1 else
          "BETA_GROUP" if i in (2, 6, 10) else "GAMMA_DIVISION")
         + f" topic {i}") for i in range(1, 11)]


@pytest.fixture(scope="module")
def stk(spark):
    docs = spark.createDataFrame(DOCS, "id string, category string")
    files = spark.createDataFrame(
        [(i, f"doc-{(i - 1) % 10 + 1:02d}", f"File Title {i:03d}",
          f"file content for item {i}") for i in range(1, 101)],
        "id long, document_id string, title string, content string")
    didx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="category")]))
    return didx, docs, files


def _survivors(didx, files, order, k):
    alpha = compile_query(
        didx, ast.Parse("PROJECT_ALPHA", field="category")) \
        .select(F.col("doc_id").alias("document_id"))
    f = files.join(F.broadcast(alpha), "document_id", "left_semi")
    return [(r["id"], r["title"]) for r in
            f.orderBy(order).limit(k).select("id", "title").collect()]


def test_asc_limit_3(stk):
    didx, _, files = stk
    got = _survivors(didx, files, F.col("title").asc(), 3)
    assert got == [(1, "File Title 001"), (3, "File Title 003"),
                   (5, "File Title 005")]


def test_desc_limit_3(stk):
    didx, _, files = stk
    got = _survivors(didx, files, F.col("title").desc(), 3)
    assert got == [(99, "File Title 099"), (97, "File Title 097"),
                   (95, "File Title 095")]


def test_k_exceeds_total(stk):
    didx, _, files = stk
    got = _survivors(didx, files, F.col("title").asc(), 1000)
    assert got == [(i, f"File Title {i:03d}")
                   for i in range(1, 101) if i % 2 == 1]


def test_k_one_max_pruning(stk):
    didx, _, files = stk
    assert _survivors(didx, files, F.col("title").asc(), 1) == \
        [(1, "File Title 001")]


def test_numeric_sort_key(stk):
    didx, _, files = stk
    got = _survivors(didx, files, F.col("id").asc(), 3)
    assert got == [(1, "File Title 001"), (3, "File Title 003"),
                   (5, "File Title 005")]
