"""aggregate_join_edge_cases.out golden (PUBLIC reference behavior,
tables replicated inline): aggregates over joins with NON-UNIQUE join
keys (many-to-many fan-out), 3-table inner/LEFT joins, FULL OUTER with
a WHERE that strips null-extended rows, and JSONB GROUP BY keys.

Ref: pg_search/tests/pg_regress/expected/aggregate_join_edge_cases.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop computer", "Electronics", 999.99, '{"brand": "TechCorp"}'),
    (2, "Desktop monitor", "Electronics", 499.99,
     '{"brand": "ViewSonic"}'),
    (3, "Running shoes", "Sports", 89.99, '{"brand": "Speedy"}'),
    (4, "Tennis racket", "Sports", 149.99, '{"brand": "Smash"}'),
    (5, "Winter jacket", "Clothing", 129.99, '{"brand": "Warmth"}'),
    # Test 1e adds this row; included from the start — every query's
    # needle either matches it deliberately ('novel') or can't
    (6, "Science fiction novel", "Books", 19.99,
     '{"brand": "PublisherX"}'),
]
REVIEWS = [
    (1, "Electronics", 5, "alice"), (2, "Electronics", 4, "bob"),
    (3, "Electronics", 3, "cloe"), (4, "Sports", 4, "alice"),
    (5, "Sports", 5, "bob"), (6, "Clothing", 3, "cloe"),
    (7, "Clothing", 4, "alice"),
]
SUPPLIERS = [
    (1, "Electronics", "TechCorp"), (2, "Electronics", "ChipMakers"),
    (3, "Sports", "AthletePro"), (4, "Clothing", "FashionInc"),
    (5, "Clothing", "StyleHouse"),
]

Q5 = "laptop OR shoes OR jacket OR monitor OR racket"
Q6 = Q5 + " OR novel"


@pytest.fixture(scope="module")
def fx(spark):
    products = spark.createDataFrame(
        PRODUCTS, "id int, description string, category string, "
        "price double, metadata string")
    reviews = spark.createDataFrame(
        REVIEWS, "id int, category string, rating int, reviewer string")
    suppliers = spark.createDataFrame(
        SUPPLIERS, "id int, category string, supplier_name string")
    idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category")]))
    return products, reviews, suppliers, idx


def _matched(fx, q):
    products, _, _, idx = fx
    m = compile_query(idx, ast.Parse(q, field="description")) \
        .select("doc_id")
    return products.join(m, products["id"] == m["doc_id"],
                         "left_semi").alias("p")


def test_1a_count_non_unique_key(fx):
    _, reviews, _, _ = fx
    p = _matched(fx, Q5)
    n = p.join(reviews.alias("r"),
               F.col("p.category") == F.col("r.category")).count()
    assert n == 12


def test_1b_group_by_non_unique_key(fx):
    _, reviews, _, _ = fx
    p = _matched(fx, Q5)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"))
           .groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.sum("r.rating").alias("sum"),
                F.avg("r.rating").alias("avg"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 2, 7, 3.5), ("Electronics", 6, 24, 4.0),
        ("Sports", 4, 18, 4.5)]


def test_1d_min_max_both_sides(fx):
    _, reviews, _, _ = fx
    p = _matched(fx, Q5)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"))
           .groupBy("p.category")
           .agg(F.min("r.rating"), F.max("r.rating"),
                F.min("p.price"), F.max("p.price"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 3, 4, 129.99, 129.99),
        ("Electronics", 3, 5, 499.99, 999.99),
        ("Sports", 4, 5, 89.99, 149.99)]


def test_1e_left_join_unmatched_group(fx):
    _, reviews, _, _ = fx
    p = _matched(fx, Q6)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"), "left")
           .groupBy("p.category")
           .agg(F.count("*").alias("c1"),
                F.count("r.rating").alias("c2"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Books", 1, 0), ("Clothing", 2, 2), ("Electronics", 6, 6),
        ("Sports", 4, 4)]


def test_2a_three_table_non_unique(fx):
    _, reviews, suppliers, _ = fx
    p = _matched(fx, Q5)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"))
           .join(suppliers.alias("s"),
                 F.col("p.category") == F.col("s.category"))
           .groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.sum("r.rating").alias("sum"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 4, 14), ("Electronics", 12, 48), ("Sports", 4, 18)]


def test_3_three_table_left_join(fx):
    _, reviews, suppliers, _ = fx
    p = _matched(fx, Q6)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"), "left")
           .join(suppliers.alias("s"),
                 F.col("p.category") == F.col("s.category"), "left")
           .groupBy("p.category")
           .agg(F.count("*").alias("c1"),
                F.count("r.rating").alias("c2"),
                F.count("s.supplier_name").alias("c3"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Books", 1, 0, 0), ("Clothing", 4, 4, 4),
        ("Electronics", 12, 12, 12), ("Sports", 4, 4, 4)]


def test_4_full_outer_where_strips_nulls(fx):
    """FULL JOIN + WHERE on p strips the right-only null-extended rows
    (PG semantics: WHERE evaluates after the join)."""
    _, reviews, _, _ = fx
    p = _matched(fx, Q6)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"), "full")
           .filter(F.col("p.id").isNotNull())
           .groupBy("p.category")
           .agg(F.count("*").alias("c1"),
                F.count("r.rating").alias("c2"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Books", 1, 0), ("Clothing", 2, 2), ("Electronics", 6, 6),
        ("Sports", 4, 4)]


def test_5_jsonb_group_by_key(fx):
    _, reviews, _, _ = fx
    p = _matched(fx, Q6)
    got = (p.join(reviews.alias("r"),
                  F.col("p.category") == F.col("r.category"))
           .groupBy(F.get_json_object("p.metadata", "$.brand")
                    .alias("brand"))
           .count().orderBy("brand").collect())
    assert [r["brand"] for r in got] == [
        "Smash", "Speedy", "TechCorp", "ViewSonic", "Warmth"]


def test_6_full_plus_left_jsonb_group(fx):
    _, reviews, suppliers, _ = fx
    p = _matched(fx, "laptop")
    got = (p.join(reviews.alias("r"), F.col("p.id") == F.col("r.id"),
                  "full")
           .join(suppliers.alias("s"),
                 F.col("r.category") == F.col("s.category"), "left")
           .filter(F.col("p.id").isNotNull())
           .groupBy(F.get_json_object("p.metadata", "$.brand")
                    .alias("brand_text"))
           .count().orderBy("brand_text").collect())
    assert [r["brand_text"] for r in got] == ["TechCorp"]
