"""aggregate.out golden (PUBLIC reference behavior, tables replicated
inline): COUNT/SUM/AVG/MIN/MAX over search matches without GROUP BY —
exact values on the 8-product corpus, COUNT 0 + NULL metrics for empty
and contradictory predicates, the numeric type-width matrix, and
DISTINCT aggregates (the reference falls back to Postgres with a
warning; Spark runs them natively — same values).

Ref: pg_search/tests/pg_regress/expected/aggregate.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop with fast processor", 5, "Electronics", 999.99, True),
    (2, "Gaming laptop with RGB", 5, "Electronics", 1299.99, True),
    (3, "Toy laptop for kids", 3, "Toys", 499.99, False),
    (4, "Wireless keyboard and mouse", 4, "Electronics", 79.99, True),
    (5, "Mechanical keyboard RGB", 5, "Electronics", 149.99, True),
    (6, "Running shoes for athletes", 5, "Sports", 89.99, True),
    (7, "Winter jacket warm", 4, "Clothing", 129.99, True),
    (8, "Summer jacket light", 3, "Clothing", 59.99, True),
]


@pytest.fixture(scope="module")
def products(spark):
    docs = spark.createDataFrame(
        PRODUCTS, "id long, description string, rating int, "
                  "category string, price double, in_stock boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category", tokenizer="keyword")]))
    return idx, docs


def _matched(idx, docs, q):
    m = compile_query(idx, q).select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_basic_aggregates(products):
    idx, docs = products
    d = _matched(idx, docs, ast.Parse("laptop", field="description"))
    r = d.agg(F.count("*").alias("c"), F.sum("price").alias("s"),
              F.avg("price").alias("a"), F.min("price").alias("mn"),
              F.max("price").alias("mx")).collect()[0]
    assert r["c"] == 3
    assert r["s"] == 2799.9700000000003
    assert r["a"] == 933.3233333333334
    assert (r["mn"], r["mx"]) == (499.99, 1299.99)


def test_empty_result_aggregates(products):
    idx, docs = products
    d = _matched(idx, docs,
                 ast.Parse("nonexistent", field="description"))
    r = d.agg(F.count("*").alias("c"), F.sum("price").alias("s"),
              F.avg("price").alias("a"), F.min("price").alias("mn"),
              F.max("price").alias("mx")).collect()[0]
    assert (r["c"], r["s"], r["a"], r["mn"], r["mx"]) == \
        (0, None, None, None, None)


def test_contradictory_predicates(products):
    # (NOT X) AND X, and search AND (NOT rating<4 AND rating<4)
    idx, docs = products
    q1 = ast.Boolean(
        must=[ast.Parse("Electronics", field="category")],
        must_not=[ast.Parse("Electronics", field="category")])
    d1 = _matched(idx, docs, q1)
    r1 = d1.agg(F.count("*").alias("c"),
                F.sum("price").alias("s")).collect()[0]
    assert (r1["c"], r1["s"]) == (0, None)

    q2 = ast.Boolean(
        must=[ast.Parse("laptop", field="description"),
              ast.Range("rating", upper=4, upper_inclusive=False)],
        must_not=[ast.Range("rating", upper=4, upper_inclusive=False)])
    d2 = _matched(idx, docs, q2)
    r2 = d2.agg(F.count("*").alias("c"),
                F.sum("price").alias("s")).collect()[0]
    assert (r2["c"], r2["s"]) == (0, None)


def test_type_width_matrix(spark):
    rows = [(1, 100, 1000000, 10, 99.99, 1.5, 3.14159, "test1"),
            (2, 200, 2000000, 20, 199.99, 2.5, 6.28318, "test2"),
            (3, 300, 3000000, 30, 299.99, 3.5, 9.42477, "test3")]
    docs = spark.createDataFrame(
        rows, "id long, int_val int, bigint_val long, smallint_val "
              "smallint, numeric_val double, float_val double, "
              "double_val double, text_val string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="text_val")]))
    d = _matched(idx, docs, ast.Parse("test1 OR test2",
                                      field="text_val"))
    r = d.agg(
        F.sum("int_val"), F.avg("int_val"),
        F.min("int_val"), F.max("int_val"),
        F.sum("bigint_val"), F.avg("bigint_val"),
        F.sum("smallint_val"), F.avg("smallint_val"),
        F.sum("numeric_val"), F.avg("numeric_val"),
        F.min("numeric_val"), F.max("numeric_val"),
        F.sum("float_val"), F.avg("float_val"),
        F.sum("double_val"), F.avg("double_val"),
        F.min("double_val"), F.max("double_val")).collect()[0]
    assert list(r) == [300, 150.0, 100, 200,
                       3000000, 1500000.0,
                       30, 15.0,
                       299.98, 149.99, 99.99, 199.99,
                       4.0, 2.0,
                       9.424769999999999, 4.712384999999999,
                       3.14159, 6.28318]


def test_distinct_aggregates(products):
    # the reference warns and falls back to PG; Spark is native —
    # identical values either way
    idx, docs = products
    d = _matched(idx, docs, ast.Parse("laptop", field="description"))
    r = d.agg(F.countDistinct("category").alias("cd"),
              F.sum("price").alias("s")).collect()[0]
    assert (r["cd"], r["s"]) == (2, 2799.9700000000003)
