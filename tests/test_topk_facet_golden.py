"""topk-agg-facet.out golden (PUBLIC reference behavior): a search
page = top-k hits + whole-match-set window aggregates
(``COUNT(*) OVER ()`` and friends) + facet buckets, all from ONE match
set.

Corpus: the reference's 5-laptop products table; 'laptop' matches 4 of
5 descriptions (Dell XPS says 'ultrabook').

Ref: pg_search/tests/pg_regress/expected/topk-agg-facet.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.search import search_with_facets

PRODUCTS = [
    (1, "MacBook Pro", "High-performance laptop for professionals",
     "Laptops", "Apple", 2499.0, 4.8, True, 150),
    (2, "Dell XPS 13", "Compact and powerful ultrabook",
     "Laptops", "Dell", 1299.0, 4.6, True, 200),
    (3, "ThinkPad X1", "Business laptop with great keyboard",
     "Laptops", "Lenovo", 1599.0, 4.5, True, 180),
    (4, "HP Spectre", "Stylish convertible laptop",
     "Laptops", "HP", 1399.0, 4.4, True, 120),
    (5, "ASUS ROG", "Gaming laptop with RTX graphics",
     "Laptops", "ASUS", 1899.0, 4.7, True, 90),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        PRODUCTS, "id long, name string, description string, "
                  "category string, brand string, price double, "
                  "rating double, in_stock boolean, sales long")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description"),
                     FieldConfig(name="brand", tokenizer="raw")]))


def test_topk_with_total_count(idx):
    # Test 1a: ||| 'laptop' ORDER BY rating DESC LIMIT 3,
    # COUNT(*) OVER () = 4 on every returned row
    out = search_with_facets(
        idx, ast.Match("description", "laptop"), limit=3,
        order_by=[("rating", "desc"), ("id", "asc")],
        columns=["id", "name", "rating"])
    assert [(r["id"], r["name"], r["rating"]) for r in out["hits"]] == [
        (1, "MacBook Pro", 4.8), (5, "ASUS ROG", 4.7),
        (3, "ThinkPad X1", 4.5)]
    assert out["aggregates"]["total_count"] == 4


def test_conjunction_no_match(idx):
    # Test 1b: &&& 'laptop powerful' -> no doc has both
    out = search_with_facets(
        idx, ast.Match("description", "laptop powerful",
                       conjunction_mode=True), limit=3)
    assert out["hits"] == [] and out["aggregates"]["total_count"] == 0


def test_multiple_window_aggregates(idx):
    # Test 3: COUNT / SUM / AVG over the whole match set while the
    # page shows only the top row
    out = search_with_facets(
        idx, ast.Match("description", "laptop"), limit=1,
        order_by=[("rating", "desc"), ("id", "asc")],
        columns=["id", "name"],
        window_aggs={"total_count": "count(*)",
                     "total_sales": "sum(sales)",
                     "avg_price": "avg(price)"})
    assert len(out["hits"]) == 1 and out["hits"][0]["id"] == 1
    a = out["aggregates"]
    assert a["total_count"] == 4
    assert a["total_sales"] == 150 + 180 + 120 + 90
    assert a["avg_price"] == pytest.approx((2499 + 1599 + 1399 + 1899) / 4)


def test_facets_alongside_topk(idx):
    # faceting: brand buckets + price stats over the match set
    out = search_with_facets(
        idx, ast.Match("description", "laptop"), limit=2,
        order_by=[("rating", "desc"), ("id", "asc")],
        facets={"brands": {"terms": {"field": "brand", "size": 10}},
                "price_stats": {"stats": {"field": "price"}}})
    assert len(out["hits"]) == 2
    buckets = {b["key"]: b["doc_count"]
               for b in out["facets"]["brands"]["buckets"]}
    # terms facets aggregate the stored fast-field VALUES (original
    # case), not analyzed index terms
    assert buckets == {"Apple": 1, "Lenovo": 1, "HP": 1, "ASUS": 1}
    stats = out["facets"]["price_stats"]
    assert stats["count"] == 4 and stats["min"] == 1399.0 \
        and stats["max"] == 2499.0
