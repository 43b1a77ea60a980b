"""basescan_limit_unnest.out golden (PUBLIC reference behavior, table
replicated inline — issue #5573): LIMIT must apply AFTER a
row-reducing set-returning function — an explode over mixed
empty/NULL/non-empty arrays still returns exactly LIMIT rows (the bug
capped the scan first and the explode then dropped below LIMIT).

Ref: pg_search/tests/pg_regress/expected/basescan_limit_unnest.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def items(spark):
    docs = spark.createDataFrame(
        [(g, "novel" if g % 3 == 0 else "manga")
         for g in range(1, 2001)],
        "id long, kind string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="kind", tokenizer="keyword")]))
    return idx, docs


WANT = [(2, 1), (4, 1), (8, 1), (10, 1), (14, 1)]


def _manga(idx, docs):
    m = compile_query(idx, ast.Term("kind", "manga")).select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_empty_array_unnest_keeps_limit(items):
    idx, docs = items
    arr = F.when(F.col("id") % 2 == 0, F.array(F.lit(1))) \
        .otherwise(F.array().cast("array<int>"))
    out = (_manga(idx, docs)
           .select("id", F.explode(arr).alias("u"))
           .orderBy("id").limit(5))
    assert [(r[0], r[1]) for r in out.collect()] == WANT


def test_null_array_unnest_keeps_limit(items):
    idx, docs = items
    arr = F.when(F.col("id") % 2 == 0, F.array(F.lit(1))) \
        .otherwise(F.lit(None).cast("array<int>"))
    out = (_manga(idx, docs)
           .select("id", F.explode(arr).alias("u"))
           .orderBy("id").limit(5))
    assert [(r[0], r[1]) for r in out.collect()] == WANT


def test_multiplying_unnest_exact_limit(items):
    idx, docs = items
    out = (_manga(idx, docs)
           .select("id", F.explode(F.array(F.lit(1), F.lit(2)))
                   .alias("u"))
           .orderBy("id", "u").limit(6))
    assert [(r[0], r[1]) for r in out.collect()] == \
        [(1, 1), (1, 2), (2, 1), (2, 2), (4, 1), (4, 2)]
