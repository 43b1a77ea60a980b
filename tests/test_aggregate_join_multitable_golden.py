"""aggregate_join_multitable.out golden (PUBLIC reference behavior,
tables replicated inline): 3- and 4-table search-driven joins under
COUNT/SUM/AVG, two-column GROUP BY, HAVING, TopK by aggregate alias,
DISTINCT aggregates, COUNT(DISTINCT), and BOOL_AND/BOOL_OR.

Ref: pg_search/tests/pg_regress/expected/aggregate_join_multitable.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop fast processor", "Electronics", 999.99, True),
    (2, "Gaming laptop RGB", "Electronics", 1299.99, True),
    (3, "Running shoes athlete", "Sports", 89.99, True),
    (4, "Winter jacket warm", "Clothing", 129.99, False),
    (5, "Toy laptop kids", "Toys", 49.99, True),
]
TAGS = [(1, 1, "tech"), (2, 1, "computer"), (3, 2, "tech"),
        (4, 2, "gaming"), (5, 3, "fitness"), (6, 3, "running"),
        (7, 4, "outdoor"), (8, 5, "tech"), (9, 5, "kids")]
REVIEWS = [(1, 1, 5), (2, 1, 4), (3, 2, 3), (4, 3, 4), (5, 4, 3)]
SUPPLIERS = [(1, 1, "TechCorp"), (2, 2, "GameInc"), (3, 3, "SportCo"),
             (4, 4, "WearIt")]

Q3 = "laptop OR shoes OR jacket"


@pytest.fixture(scope="module")
def fx(spark):
    products = spark.createDataFrame(
        PRODUCTS, "id int, description string, category string, "
        "price double, in_stock boolean")
    tags = spark.createDataFrame(TAGS,
                                 "id int, product_id int, tag_name string")
    reviews = spark.createDataFrame(REVIEWS,
                                    "id int, product_id int, rating int")
    suppliers = spark.createDataFrame(
        SUPPLIERS, "id int, product_id int, supplier_name string")
    idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category")]))
    return products, tags, reviews, suppliers, idx


def _joined(fx, q, with_suppliers=False):
    products, tags, reviews, suppliers, idx = fx
    m = compile_query(idx, ast.Parse(q, field="description")) \
        .select("doc_id")
    p = products.join(m, products["id"] == m["doc_id"],
                      "left_semi").alias("p")
    j = (p.join(tags.alias("t"), F.col("p.id") == F.col("t.product_id"))
         .join(reviews.alias("r"),
               F.col("p.id") == F.col("r.product_id")))
    if with_suppliers:
        j = j.join(suppliers.alias("s"),
                   F.col("p.id") == F.col("s.product_id"))
    return j


def test_1_three_table_count_sum_avg(fx):
    got = (_joined(fx, Q3).groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.sum("r.rating").alias("sum"),
                F.avg("r.rating").alias("avg"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 1, 3, 3.0), ("Electronics", 6, 24, 4.0),
        ("Sports", 2, 8, 4.0)]


def test_2_four_table_join(fx):
    got = (_joined(fx, Q3, with_suppliers=True).groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.sum("r.rating").alias("sum"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 1, 3), ("Electronics", 6, 24), ("Sports", 2, 8)]


def test_3_two_group_columns(fx):
    got = (_joined(fx, "laptop").groupBy("p.category", "t.tag_name")
           .agg(F.count("*").alias("count"),
                F.sum("r.rating").alias("sum"))
           .orderBy("category", "tag_name").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", "computer", 2, 9),
        ("Electronics", "gaming", 1, 3),
        ("Electronics", "tech", 3, 12)]


def test_4_having(fx):
    got = (_joined(fx, Q3).groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.sum("r.rating").alias("sum"))
           .filter(F.col("count") > 2)
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [("Electronics", 6, 24)]


def test_5_topk_by_aggregate_alias(fx):
    got = (_joined(fx, Q3).groupBy("p.category")
           .agg(F.count("*").alias("cnt"),
                F.sum("r.rating").alias("total"))
           .orderBy(F.col("cnt").desc()).limit(2).collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 6, 24), ("Sports", 2, 8)]


def test_6_sum_distinct(fx):
    got = (_joined(fx, Q3).groupBy("p.category")
           .agg(F.sum_distinct(F.col("r.rating")).alias("sum"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 3), ("Electronics", 12), ("Sports", 4)]


def test_7_count_distinct(fx):
    got = (_joined(fx, "laptop").groupBy("p.category")
           .agg(F.countDistinct("t.tag_name").alias("count"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [("Electronics", 3)]


def test_8_bool_and_or(fx):
    got = (_joined(fx, Q3).groupBy("p.category")
           .agg(F.bool_and("p.in_stock").alias("ba"),
                F.bool_or("p.in_stock").alias("bo"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", False, False), ("Electronics", True, True),
        ("Sports", True, True)]
