"""columnar_advanced_03_limit_topk golden (PUBLIC reference behavior,
corpus replicated inline): LIMIT + ORDER BY over mixed fast fields is
served by the TopK scan — price/title/rating sort keys, keyword-category
search predicates, boolean filters, range conjunctions, and the
reference's stable key-order tiebreak on equal sort keys.

Ref: pg_search/tests/pg_regress/expected/columnar_advanced_03_limit_topk.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

CATS = ["Electronics", "Books", "Clothing", "Food", "Toys"]


def _rows():
    # generate_series(1, 100): deterministic ratings/prices/categories
    out = []
    for i in range(1, 101):
        out.append((i, f"Product {i}", f"Description for product {i}",
                    float(i % 5) + 1.0, float(100 * i), CATS[i % 5],
                    i % 2 == 0))
    return out


@pytest.fixture(scope="module")
def topk(spark):
    docs = spark.createDataFrame(
        _rows(), "id int, title string, description string, rating double, "
        "price double, category string, is_available boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title"),
                     FieldConfig(name="description"),
                     FieldConfig(name="category", tokenizer="keyword")]))
    return docs, idx


def _match(docs, idx, q):
    m = compile_query(idx, q).select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_limit_order_by_price(topk):
    docs, idx = topk
    got = (_match(docs, idx, ast.Parse("Electronics", field="category"))
           .select("title", "category", "rating", "price")
           .orderBy("price").limit(5).collect())
    assert [tuple(r) for r in got] == [
        ("Product 5", "Electronics", 1.0, 500.0),
        ("Product 10", "Electronics", 1.0, 1000.0),
        ("Product 15", "Electronics", 1.0, 1500.0),
        ("Product 20", "Electronics", 1.0, 2000.0),
        ("Product 25", "Electronics", 1.0, 2500.0)]


def test_limit_order_by_title_string(topk):
    """ORDER BY title is raw-string (byte) order: Product 1, 10, 100, 11…"""
    docs, idx = topk
    got = (_match(docs, idx,
                  ast.Parse("Books OR Electronics", field="category"))
           .select("title", "category").orderBy("title").limit(15).collect())
    assert [tuple(r) for r in got] == [
        ("Product 1", "Books"), ("Product 10", "Electronics"),
        ("Product 100", "Electronics"), ("Product 11", "Books"),
        ("Product 15", "Electronics"), ("Product 16", "Books"),
        ("Product 20", "Electronics"), ("Product 21", "Books"),
        ("Product 25", "Electronics"), ("Product 26", "Books"),
        ("Product 30", "Electronics"), ("Product 31", "Books"),
        ("Product 35", "Electronics"), ("Product 36", "Books"),
        ("Product 40", "Electronics")]


def test_limit_boolean_filter_multi_key_sort(topk):
    docs, idx = topk
    got = (docs.filter(F.col("is_available"))
           .select("title", "is_available", "rating")
           .orderBy(F.col("rating").desc(), F.col("title").asc())
           .limit(7).collect())
    assert [tuple(r) for r in got] == [
        ("Product 14", True, 5.0), ("Product 24", True, 5.0),
        ("Product 34", True, 5.0), ("Product 4", True, 5.0),
        ("Product 44", True, 5.0), ("Product 54", True, 5.0),
        ("Product 64", True, 5.0)]


def test_limit_numeric_range_conjunction(topk):
    docs, _ = topk
    got = (docs.filter((F.col("rating") > 3.0) & (F.col("price") < 500))
           .select("rating", "price").orderBy(F.col("price").desc())
           .limit(12).collect())
    assert [tuple(r) for r in got] == [(5.0, 400.0), (4.0, 300.0)]


def test_limit_between_and_search(topk):
    docs, idx = topk
    got = (_match(docs, idx, ast.Parse("Toys OR Clothing", field="category"))
           .filter(F.col("rating").between(2.5, 4.5))
           .select("title", "category", "rating", "price")
           .orderBy(F.col("price").desc()).limit(8).collect())
    assert [tuple(r) for r in got] == [
        ("Product 97", "Clothing", 3.0, 9700.0),
        ("Product 92", "Clothing", 3.0, 9200.0),
        ("Product 87", "Clothing", 3.0, 8700.0),
        ("Product 82", "Clothing", 3.0, 8200.0),
        ("Product 77", "Clothing", 3.0, 7700.0),
        ("Product 72", "Clothing", 3.0, 7200.0),
        ("Product 67", "Clothing", 3.0, 6700.0),
        ("Product 62", "Clothing", 3.0, 6200.0)]


def test_limit_rating_desc_key_tiebreak(topk):
    """Equal rating sort keys page out in key order (the reference TopK
    collector's stable doc-address tiebreak): Products 4,9,14,19,24."""
    docs, idx = topk
    got = (_match(docs, idx, ast.Parse("Product", field="title"))
           .select("title", "rating", "price", "category", "id")
           .orderBy(F.col("rating").desc(), F.col("id").asc())
           .limit(5).collect())
    assert [tuple(r)[:4] for r in got] == [
        ("Product 4", 5.0, 400.0, "Toys"),
        ("Product 9", 5.0, 900.0, "Toys"),
        ("Product 14", 5.0, 1400.0, "Toys"),
        ("Product 19", 5.0, 1900.0, "Toys"),
        ("Product 24", 5.0, 2400.0, "Toys")]
