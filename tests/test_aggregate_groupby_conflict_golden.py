"""aggregate-groupby-conflict.out golden (PUBLIC reference behavior,
table replicated inline): GROUP BY on the SAME column that is being
aggregated — the case Tantivy's grouped aggregation handles by nesting
metric sub-aggs under a terms bucket keyed on that field.  Also the
non-fast GROUP BY fallback (plain aggregation over the match set).

Ref: pg_search/tests/pg_regress/expected/aggregate-groupby-conflict.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, "Product A1", "electronics", 1, 100.00, 500),
    (2, "Product A2", "electronics", 1, 150.00, 600),
    (3, "Product B1", "electronics", 2, 200.00, 700),
    (4, "Product B2", "electronics", 2, 250.00, 800),
    (5, "Product C1", "books", 3, 30.00, 300),
    (6, "Product C2", "books", 3, 40.00, 400),
    (7, "Product D1", "books", 4, 50.00, 450),
    (8, "Product D2", "books", 4, 60.00, 500),
    (9, "Product E1", "clothing", 5, 80.00, 200),
    (10, "Product E2", "clothing", 5, 90.00, 250),
    (11, "Product F1", "electronics", 3, 299.99, 1000),
    (12, "Product F2", "electronics", 4, 299.99, 1100),
    (13, "Product G1", "books", 2, 299.99, 800),
    (14, "Product G2", "clothing", 1, 299.99, 300),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, title string, category string, rating int, "
        "price double, views int")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="category")]))


def _buckets(idx, query, field, aggs):
    env = search_aggregate(idx, query, {
        "g": {"terms": {"field": field, "size": 65000,
                        "order": {"_key": "asc"}},
              "aggs": aggs}})
    return env["aggregations"]["g"]["buckets"]


def test_1_group_by_rating_with_avg_rating(idx):
    """Test 1: GROUP BY rating, AVG(rating) — the conflict case."""
    got = _buckets(idx, ast.Parse("Product", field="title"), "rating",
                   {"a": {"avg": {"field": "rating"}}})
    assert [(b["key"], b["a"]["value"], b["doc_count"]) for b in got] == [
        (1, 1.0, 3), (2, 2.0, 3), (3, 3.0, 3), (4, 4.0, 3), (5, 5.0, 2)]


def test_2_group_by_price_with_sum_price(idx):
    got = _buckets(idx, ast.Parse("Product", field="title"), "price",
                   {"s": {"sum": {"field": "price"}}})
    assert [(b["key"], round(b["s"]["value"], 2), b["doc_count"])
            for b in got] == [
        (30.0, 30.0, 1), (40.0, 40.0, 1), (50.0, 50.0, 1),
        (60.0, 60.0, 1), (80.0, 80.0, 1), (90.0, 90.0, 1),
        (100.0, 100.0, 1), (150.0, 150.0, 1), (200.0, 200.0, 1),
        (250.0, 250.0, 1), (299.99, 1199.96, 4)]


def test_3_group_by_views_with_max_min(idx):
    got = _buckets(idx, ast.Parse("Product", field="title"), "views",
                   {"mx": {"max": {"field": "views"}},
                    "mn": {"min": {"field": "views"}}})
    keys = [200, 250, 300, 400, 450, 500, 600, 700, 800, 1000, 1100]
    counts = {300: 2, 500: 2, 800: 2}
    assert [(b["key"], b["mx"]["value"], b["mn"]["value"], b["doc_count"])
            for b in got] == \
        [(float(k), float(k), float(k), counts.get(k, 1)) for k in keys]


def test_4_multiple_aggs_on_groupby_field(idx):
    got = _buckets(idx, ast.Parse("electronics", field="category"),
                   "rating",
                   {"a": {"avg": {"field": "rating"}},
                    "mn": {"min": {"field": "rating"}},
                    "mx": {"max": {"field": "rating"}}})
    assert [(b["key"], b["a"]["value"], b["mn"]["value"], b["mx"]["value"],
             b["doc_count"]) for b in got] == [
        (1, 1.0, 1.0, 1.0, 2), (2, 2.0, 2.0, 2.0, 2),
        (3, 3.0, 3.0, 3.0, 1), (4, 4.0, 4.0, 4.0, 1)]


def test_7_group_by_non_fast_title_fallback(idx):
    """Test 7: GROUP BY title falls back to a plain aggregation over the
    match set (the reference warns and uses GroupAggregate)."""
    m = compile_query(idx, ast.Parse("electronics", field="category")) \
        .select("doc_id")
    docs = idx.docs.join(m, idx.docs["id"] == m["doc_id"], "left_semi")
    got = (docs.groupBy("title")
           .agg(F.avg("rating").alias("avg_rating"),
                F.count("*").alias("count"))
           .orderBy("title").limit(5).collect())
    assert [(r["title"], r["avg_rating"], r["count"]) for r in got] == [
        ("Product A1", 1.0, 1), ("Product A2", 1.0, 1),
        ("Product B1", 2.0, 1), ("Product B2", 2.0, 1),
        ("Product F1", 3.0, 1)]
