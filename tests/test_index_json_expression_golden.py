"""index_json_expression.out + top_level_expression.out goldens (PUBLIC
reference behavior): indexed EXPRESSIONS projecting out of JSON columns
— an ngram-tokenized (metadata->>'color') expression field driving a
COUNT aggregate, a JSON-projected int expression with sort_by + TopK,
and a top-level &&& with a non-indexed jsonb_path_exists heap filter
ordered by score (f32-exact).

Ref: pg_search/tests/pg_regress/expected/index_json_expression.out
     pg_search/tests/pg_regress/expected/top_level_expression.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def test_ngram_expression_over_json_count(spark):
    """(metadata->>'color')::pdb.ngram(2,3): COUNT(*) for 'white' = 3."""
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(
            name="metadata", source="get_json_object(metadata, '$.color')",
            tokenizer="ngram",
            tokenizer_opts={"min_gram": 2, "max_gram": 3,
                            "prefix_only": False})]))
    n = compile_query(idx, ast.Match("metadata", "white")).count()
    assert n == 3


def test_json_projected_int_expression_topk(spark):
    """(((metadata->>'rating')::int)::pdb.alias('rating')) with
    sort_by='rating DESC NULLS LAST' — TopK over the expression."""
    docs = spark.createDataFrame(
        [(1, '{"rating": 10}', "foo"), (2, '{"rating": 20}', "foo"),
         (3, '{"rating": 30}', "bar")],
        "id int, metadata string, name string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name")],
        sort_by="rating desc nulls last"))
    m = compile_query(idx, ast.Parse("foo", field="name")).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"])
           .select("id", F.get_json_object("metadata", "$.rating")
                   .cast("int").alias("rating"))
           .orderBy(F.col("rating").desc_nulls_last()).limit(2).collect())
    assert [(r["id"], r["rating"]) for r in got] == [(2, 20), (1, 10)]


def test_top_level_expression_with_heap_filter(spark):
    """top_level_expression.out: content &&& 'Beijing' AND
    jsonb_path_exists(extra, '$.type'), ORDER BY score DESC."""
    docs = spark.createDataFrame(
        [(1, "Beijing CBD area",
          '{"type": "business", "district": "Chaoyang"}'),
         (2, "Beijing Palace Museum",
          '{"type": "landmark", "district": "Dongcheng"}'),
         (3, "Shanghai Bund",
          '{"type": "tourism", "district": "Huangpu"}'),
         (4, "Universal Studios Beijing",
          '{"type": "entertainment", "district": "Tongzhou"}')],
        "id int, content string, extra string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    m = compile_query(idx, ast.Match("content", "Beijing",
                                     conjunction_mode=True))
    got = (docs.join(m, docs["id"] == m["doc_id"])
           .filter(F.get_json_object("extra", "$.type").isNotNull())
           .select("score", "content", "extra")
           .orderBy(F.col("score").desc(), F.col("id"))
           .limit(10).collect())
    assert [r["content"] for r in got] == [
        "Beijing CBD area", "Beijing Palace Museum",
        "Universal Studios Beijing"]
    for r in got:
        assert np.float32(r["score"]) == np.float32(0.34388584)
