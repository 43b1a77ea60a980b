"""aggregate_join_topk.out golden (PUBLIC reference behavior, tables
replicated inline): GROUP BY aggregates over a search-driven join with
ORDER BY aggregate + LIMIT (TopK over groups) — multiple aggregates,
ASC bottom-K, LIMIT 1, LIMIT > #groups, OFFSET pages, scalar (no
GROUP BY) aggregates, and TopK-vs-full-sort parity.  Tied aggregate
values make the within-tie order unpinned (the reference's own ON/OFF
runs disagree), so ties compare as sets.

Ref: pg_search/tests/pg_regress/expected/aggregate_join_topk.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop with fast processor", "Electronics", 999.99, 5),
    (2, "Gaming laptop with RGB", "Electronics", 1299.99, 5),
    (3, "Wireless mouse for office", "Electronics", 29.99, 4),
    (4, "Running shoes for athletes", "Sports", 89.99, 4),
    (5, "Basketball shoes premium", "Sports", 119.99, 3),
    (6, "Winter jacket warm", "Clothing", 129.99, 3),
    (7, "Summer dress casual", "Clothing", 49.99, 4),
    (8, "Toy laptop for kids", "Toys", 499.99, 2),
    (9, "Puzzle game educational", "Toys", 19.99, 5),
    (10, "Cookbook healthy recipes", "Books", 24.99, 4),
]
TAGS = [(1, 1, "tech"), (2, 1, "computer"), (3, 2, "tech"),
        (4, 2, "gaming"), (5, 3, "tech"), (6, 3, "office"),
        (7, 4, "fitness"), (8, 4, "running"), (9, 5, "fitness"),
        (10, 5, "basketball"), (11, 6, "outdoor"), (12, 7, "fashion"),
        (13, 8, "tech"), (14, 8, "kids"), (15, 9, "kids"),
        (16, 9, "education"), (17, 10, "cooking")]

Q = "laptop OR shoes OR jacket OR dress OR toy OR puzzle OR cookbook"


@pytest.fixture(scope="module")
def fx(spark):
    products = spark.createDataFrame(
        PRODUCTS, "id int, description string, category string, "
        "price double, rating int")
    tags = spark.createDataFrame(TAGS,
                                 "id int, product_id int, tag_name string")
    idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category")]))
    m = compile_query(idx, ast.Parse(Q, field="description")) \
        .select("doc_id")
    matched = products.join(m, products["id"] == m["doc_id"],
                            "left_semi").alias("p")
    joined = matched.join(tags.alias("t"),
                          F.col("p.id") == F.col("t.product_id"))
    return products, tags, idx, joined


FULL = {"Electronics": 4, "Sports": 4, "Toys": 4, "Clothing": 2,
        "Books": 1}


def test_1_group_by_on_join(fx):
    *_, joined = fx
    got = {r["category"]: r["count"] for r in
           joined.groupBy("p.category")
           .agg(F.count("*").alias("count")).collect()}
    assert got == FULL


def test_2_order_by_count_desc_limit(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"))
           .orderBy(F.col("count").desc()).limit(3).collect())
    assert sorted((r["category"], r["count"]) for r in got) == \
        [("Electronics", 4), ("Sports", 4), ("Toys", 4)]


def test_3_order_by_sum_desc_limit(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.round(F.sum("p.price"), 2).alias("sum"))
           .orderBy(F.col("sum").desc()).limit(2).collect())
    assert [(r["category"], r["sum"]) for r in got] == \
        [("Electronics", 4599.96), ("Toys", 1039.96)]


def test_4_bottom_k_asc(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"))
           .orderBy(F.col("count").asc()).limit(2).collect())
    assert [(r["category"], r["count"]) for r in got] == \
        [("Books", 1), ("Clothing", 2)]


def test_5_multiple_aggregates(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.round(F.sum("p.price"), 2).alias("sum"),
                F.min("p.rating").alias("min"),
                F.max("p.rating").alias("max"))
           .orderBy(F.col("sum").desc()).limit(3).collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 4, 4599.96, 5, 5),
        ("Toys", 4, 1039.96, 2, 5),
        ("Sports", 4, 419.96, 3, 4)]


def test_6_parity_full_order_by(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"),
                F.sum("p.price").alias("sum"))
           .orderBy(F.col("count").desc()).collect())
    assert {(r["category"], r["count"], round(r["sum"], 2))
            for r in got} == {
        ("Electronics", 4, 4599.96), ("Sports", 4, 419.96),
        ("Toys", 4, 1039.96), ("Clothing", 2, 179.98),
        ("Books", 1, 24.99)}
    assert [r["count"] for r in got] == [4, 4, 4, 2, 1]


def test_7_scalar_aggregates(fx):
    products, tags, idx, _ = fx
    m = compile_query(idx, ast.Parse("laptop OR shoes",
                                     field="description")) \
        .select("doc_id")
    p = products.join(m, products["id"] == m["doc_id"],
                      "left_semi").alias("p")
    j = p.join(tags.alias("t"), F.col("p.id") == F.col("t.product_id"))
    r = j.agg(F.count("*").alias("count"),
              F.round(F.sum("p.price"), 2).alias("sum"),
              F.avg("p.rating").alias("avg")).collect()[0]
    assert (r["count"], r["sum"], r["avg"]) == (10, 6019.9, 3.8)


def test_8_limit_one(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"))
           .orderBy(F.col("count").desc()).limit(1).collect())
    assert len(got) == 1 and got[0]["count"] == 4
    assert got[0]["category"] in ("Electronics", "Sports", "Toys")


def test_9_limit_past_group_count(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"))
           .orderBy(F.col("count").desc()).limit(100).collect())
    assert {(r["category"], r["count"]) for r in got} == set(FULL.items())


def test_10_offset_page(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.count("*").alias("count"))
           .orderBy(F.col("count").desc(), F.col("category"))
           .offset(1).limit(2).collect())
    # deterministic tiebreak (category asc): full order is
    # Electronics, Sports, Toys, Clothing, Books → page = Sports, Toys
    assert [(r["category"], r["count"]) for r in got] == \
        [("Sports", 4), ("Toys", 4)]


def test_12_bottom_k_by_sum(fx):
    *_, joined = fx
    got = (joined.groupBy("p.category")
           .agg(F.round(F.sum("p.price"), 2).alias("sum"))
           .orderBy(F.col("sum").asc()).limit(2).collect())
    assert [(r["category"], r["sum"]) for r in got] == \
        [("Books", 24.99), ("Clothing", 179.98)]
