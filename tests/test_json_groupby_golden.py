"""json_groupby_aggregate.out golden (PUBLIC reference behavior):
GROUP BY over JSON-extracted paths gated by pdb.exists() predicates,
with COUNT / SUM / AVG / MIN / MAX over casted JSON numbers, and NULL
handling for missing keys (docs without the path simply don't match
the exists() gate).

Ref: pg_search/tests/pg_regress/expected/json_groupby_aggregate.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _idx(spark, rows):
    docs = spark.createDataFrame(rows, "id long, metadata string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata", tokenizer="json")]))
    return idx, docs


def _matched(idx, docs, node):
    m = compile_query(idx, node).select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"]).drop("doc_id")


SINGLE = [
    (1, '{"category": "electronics", "brand": "Apple", "price": 999}'),
    (2, '{"category": "electronics", "brand": "Samsung", "price": 799}'),
    (3, '{"category": "electronics", "brand": "Apple", "price": 1299}'),
    (4, '{"category": "clothing", "brand": "Nike", "price": 89}'),
    (5, '{"category": "clothing", "brand": "Adidas", "price": 79}'),
    (6, '{"category": "clothing", "brand": "Nike", "price": 99}'),
]


def test_single_json_field_group_by(spark):
    idx, docs = _idx(spark, SINGLE)
    got = (_matched(idx, docs, ast.Exists("metadata.category"))
           .groupBy(F.get_json_object("metadata", "$.category")
                    .alias("category"))
           .agg(F.count("*").alias("count"))
           .orderBy("category").collect())
    assert [(r["category"], r["count"]) for r in got] == \
        [("clothing", 3), ("electronics", 3)]


def test_multiple_json_field_group_by(spark):
    rows = [
        (1, '{"category": "electronics", "brand": "Apple"}'),
        (2, '{"category": "electronics", "brand": "Samsung"}'),
        (3, '{"category": "electronics", "brand": "Apple"}'),
        (4, '{"category": "clothing", "brand": "Nike"}'),
        (5, '{"category": "clothing", "brand": "Nike"}'),
    ]
    idx, docs = _idx(spark, rows)
    node = ast.Boolean(must=[ast.Exists("metadata.category"),
                             ast.Exists("metadata.brand")])
    got = (_matched(idx, docs, node)
           .groupBy(F.get_json_object("metadata", "$.category")
                    .alias("category"),
                    F.get_json_object("metadata", "$.brand")
                    .alias("brand"))
           .agg(F.count("*").alias("count"))
           .orderBy("category", "brand").collect())
    assert [(r["category"], r["brand"], r["count"]) for r in got] == \
        [("clothing", "Nike", 2), ("electronics", "Apple", 2),
         ("electronics", "Samsung", 1)]


AGG_ROWS = [
    (1, '{"brand": "Apple", "price": 999}'),
    (2, '{"brand": "Samsung", "price": 799}'),
    (3, '{"brand": "Apple", "price": 1299}'),
    (4, '{"brand": "Nike", "price": 89}'),
    (5, '{"brand": "Nike", "price": 99}'),
]


def test_json_group_by_all_aggregates(spark):
    idx, docs = _idx(spark, AGG_ROWS)
    price = F.get_json_object("metadata", "$.price").cast("double")
    got = (_matched(idx, docs, ast.Exists("metadata.price"))
           .groupBy(F.get_json_object("metadata", "$.brand")
                    .alias("brand"))
           .agg(F.count("*").alias("n"),
                F.sum(price).alias("total"),
                F.avg(price).alias("avg"),
                F.min(price).alias("mn"),
                F.max(price).alias("mx"))
           .orderBy("brand").collect())
    assert [(r["brand"], r["n"], r["total"], r["avg"], r["mn"], r["mx"])
            for r in got] == [
        ("Apple", 2, 2298.0, 1149.0, 999.0, 1299.0),
        ("Nike", 2, 188.0, 94.0, 89.0, 99.0),
        ("Samsung", 1, 799.0, 799.0, 799.0, 799.0)]


def test_json_group_by_null_handling(spark):
    # missing keys: docs without the path never pass the exists() gate
    rows = [
        (1, '{"brand": "Apple", "category": "electronics"}'),
        (2, '{"brand": "Samsung"}'),      # missing category
        (3, '{}'),                        # empty JSON
        (4, '{"category": "clothing"}'),  # missing brand
    ]
    idx, docs = _idx(spark, rows)
    got = (_matched(idx, docs, ast.Exists("metadata.category"))
           .groupBy(F.get_json_object("metadata", "$.category")
                    .alias("category"))
           .agg(F.count("*").alias("count"))
           .orderBy("category").collect())
    assert [(r["category"], r["count"]) for r in got] == \
        [("clothing", 1), ("electronics", 1)]
    # brand gate sees a different subset
    got = _matched(idx, docs, ast.Exists("metadata.brand")).count()
    assert got == 2
