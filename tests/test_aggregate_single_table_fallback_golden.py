"""aggregate_single_table_datafusion.out golden (PUBLIC reference
behavior): a SQL GROUP BY whose estimated group count exceeds
max_term_agg_buckets is NOT truncated — it routes to the fallback
aggregate backend and returns EVERY group (reference Tests 2.2-3.1,
bucket limit forced to 1, 11 groups still returned), while scalar
aggregates ignore the cap entirely.  The bucket abort applies only to
the ES-style pdb.agg envelope (api/aggregate.rs bucket_limit — covered
by test_aggs' max_agg_buckets test); relational GROUP BY always
completes.  Spark restatement: df.groupBy IS the fallback backend, so
the cap must never gate it.

Ref: pg_search/tests/pg_regress/expected/aggregate_single_table_datafusion.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.config import CONFIG
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop computer fast", "Electronics", 999.99, 5),
    (2, "Gaming laptop RGB", "Electronics", 1299.99, 4),
    (3, "Running shoes light", "Sports", 89.99, 4),
    (4, "Winter jacket warm", "Clothing", 129.99, 3),
    (5, "Toy robot fun", "Toys", 49.99, 2),
    (6, "Coffee maker brew", "Kitchen", 79.99, 5),
    (7, "Headphones wireless", "Audio", 199.99, 4),
    (8, "Yoga mat stretch", "Fitness", 29.99, 3),
    (9, "Book novel read", "Books", 14.99, 5),
    (10, "Pen ballpoint write", "Office", 2.99, 3),
    (11, "Desk wooden sit", "Furniture", 399.99, 4),
    (12, "Lamp bright light", "Lighting", 59.99, 4),
]
ALL_TERMS = ("laptop OR shoes OR jacket OR robot OR coffee OR headphones "
             "OR yoga OR book OR pen OR desk OR lamp")
GROUPS = [
    ("Audio", 1, 199.99), ("Books", 1, 14.99), ("Clothing", 1, 129.99),
    ("Electronics", 2, 2299.98), ("Fitness", 1, 29.99),
    ("Furniture", 1, 399.99), ("Kitchen", 1, 79.99),
    ("Lighting", 1, 59.99), ("Office", 1, 2.99), ("Sports", 1, 89.99),
    ("Toys", 1, 49.99),
]


@pytest.fixture(scope="module")
def products(spark):
    docs = spark.createDataFrame(
        PRODUCTS, "id int, description string, category string, "
                  "price double, rating int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="default"),
                     FieldConfig(name="category", tokenizer="default")],
        numeric_fields=["price", "rating"]))
    return docs, idx


def _matched(products_fix, qstr):
    docs, idx = products_fix
    m = compile_query(idx, ast.Parse(qstr, field="description")) \
        .select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_group_by_returns_all_groups(products):
    got = (_matched(products, ALL_TERMS)
           .groupBy("category").agg(F.count("*").alias("c"))
           .orderBy("category").collect())
    assert [(r["category"], r["c"]) for r in got] == \
        [(g, c) for g, c, _ in GROUPS]


def test_group_by_not_truncated_by_bucket_cap(products):
    """Reference Test 2.2: bucket limit 1 + 11 groups → all 11 returned
    (the cap routes to the fallback backend; it never truncates a
    relational GROUP BY)."""
    old = CONFIG.max_agg_buckets
    CONFIG.max_agg_buckets = 1
    try:
        got = (_matched(products, ALL_TERMS)
               .groupBy("category").agg(F.count("*").alias("c"),
                                        F.sum("price").alias("s"))
               .orderBy("category").collect())
        assert len(got) == 11
        assert [(r["category"], r["c"]) for r in got] == \
            [(g, c) for g, c, _ in GROUPS]
        for r, (_, _, s) in zip(got, GROUPS):
            assert r["s"] == pytest.approx(s, abs=1e-6)
    finally:
        CONFIG.max_agg_buckets = old


def test_multiple_aggregates_per_group(products):
    got = (_matched(products, ALL_TERMS)
           .groupBy("category")
           .agg(F.count("*").alias("c"), F.sum("price").alias("s"),
                F.avg("rating").alias("a"), F.min("price").alias("mn"),
                F.max("price").alias("mx"))
           .orderBy("category").collect())
    e = {r["category"]: r for r in got}
    assert (e["Electronics"]["c"], e["Electronics"]["a"]) == (2, 4.5)
    assert e["Electronics"]["s"] == pytest.approx(2299.98)
    assert e["Electronics"]["mn"] == pytest.approx(999.99)
    assert e["Electronics"]["mx"] == pytest.approx(1299.99)
    assert e["Toys"]["a"] == 2.0


def test_scalar_aggregate_ignores_cap(products):
    old = CONFIG.max_agg_buckets
    CONFIG.max_agg_buckets = 1
    try:
        r = _matched(products, "laptop OR shoes").agg(
            F.count("*").alias("c"), F.sum("price").alias("s")).collect()[0]
        assert r["c"] == 3
        assert r["s"] == pytest.approx(2389.97)
    finally:
        CONFIG.max_agg_buckets = old
