"""columnar_advanced_09_multi_index_search golden (PUBLIC reference
behavior, corpus replicated inline): several bm25 indexes cooperating in
one query — product/category/review joins with per-table search
predicates, IN-subqueries against a second index, three-branch typed
UNION ALL, and LEFT JOIN review aggregates driving CASE buckets.
(Reference tests 3 & 4 are PG planner ERRORs — grouping-clause and
unsupported-shape rejections — with no result rows to port.)

Equal-sort-key output order follows the reference TopK collector's
stable key order; the port pins it with the matching explicit tiebreak.

Ref: pg_search/tests/pg_regress/expected/columnar_advanced_09_multi_index_search.out
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

CAT_ROWS = [
    (1, "Electronics", "Electronic devices and accessories", 40, True),
    (2, "Books", "Books and publications", 30, True),
    (3, "Clothing", "Apparel and fashion items", 25, True),
    (4, "Home & Kitchen", "Home goods and kitchen items", 20, True),
    (5, "Toys", "Toys and games", 15, True),
    (6, "Sports", "Sporting goods and equipment", 10, True),
    (7, "Beauty", "Beauty and personal care items", 5, False),
    (8, "Automotive", "Car parts and accessories", 8, True),
    (9, "Office", "Office supplies and equipment", 12, True),
    (10, "Outdoors", "Outdoor equipment and accessories", 18, True),
]

REVIEW_TEXT = [
    "Great product, very satisfied with my purchase!",
    "Good quality but a bit expensive.",
    "Average product, meets basic expectations.",
    "Not very impressed, could be better.",
    "Terrible product, complete waste of money!",
]


def _products():
    return [(i, f"Product {i}",
             f"Description for product {i}. This product has various "
             "features and specifications.",
             50.0 + i * 10, i * 2, 0.1 + i * 0.2, i % 5 != 0,
             dt.datetime(1988, 4, 29) + dt.timedelta(days=i))
            for i in range(1, 101)]


def _reviews():
    return [(i, (i % 20) + 1, f"Reviewer {(i % 50) + 1}",
             REVIEW_TEXT[i % 5], (i % 5) + 1, (i % 50) * 2,
             dt.datetime(1988, 4, 29) + dt.timedelta(days=i))
            for i in range(1, 201)]


def _product_categories():
    pc = [(i, 1 + (i % 10)) for i in range(1, 101)]
    pc += [(i, 1 + ((i + 5) % 10)) for i in range(1, 101) if i % 3 == 0]
    pc += [(i, 1 + ((i + 7) % 10)) for i in range(1, 101) if i % 9 == 0]
    return pc


@pytest.fixture(scope="module")
def shop(spark):
    products = spark.createDataFrame(
        _products(), "id int, name string, description string, "
        "price double, stock_count int, weight double, "
        "is_available boolean, created_at timestamp")
    categories = spark.createDataFrame(
        CAT_ROWS, "id int, name string, description string, "
        "product_count int, is_active boolean")
    reviews = spark.createDataFrame(
        _reviews(), "id int, product_id int, reviewer_name string, "
        "content string, rating int, helpful_votes int, "
        "created_at timestamp")
    pc = spark.createDataFrame(_product_categories(),
                               "product_id int, category_id int")
    p_idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    c_idx = build_index(categories, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    r_idx = build_index(reviews, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="reviewer_name"),
                                     FieldConfig(name="content")]))
    return dict(products=products, categories=categories, reviews=reviews,
                pc=pc, p=p_idx, c=c_idx, r=r_idx)


def _match(docs, idx, q, key="id"):
    m = compile_query(idx, q).select("doc_id")
    return docs.join(m, docs[key] == m["doc_id"], "left_semi")


def test_product_category_join_topk(shop):
    p = _match(shop["products"], shop["p"],
               ast.Parse("Product", field="name")).alias("p")
    got = (p.join(shop["pc"].alias("pc"),
                  F.col("p.id") == F.col("pc.product_id"))
           .join(shop["categories"].alias("c"),
                 F.col("pc.category_id") == F.col("c.id"))
           .filter(F.col("c.is_active"))
           .select(F.col("p.name"), F.col("p.price"),
                   F.col("c.name").alias("category"), F.col("c.id"))
           .orderBy(F.col("p.price").desc(), F.col("c.id").asc())
           .limit(10).collect())
    assert [tuple(r)[:3] for r in got] == [
        ("Product 100", 1050.0, "Electronics"),
        ("Product 99", 1040.0, "Toys"),
        ("Product 99", 1040.0, "Outdoors"),
        ("Product 98", 1030.0, "Office"),
        ("Product 97", 1020.0, "Automotive"),
        ("Product 96", 1010.0, "Books"),
        ("Product 95", 1000.0, "Sports"),
        ("Product 94", 990.0, "Toys"),
        ("Product 93", 980.0, "Home & Kitchen"),
        ("Product 93", 980.0, "Office")]


def test_product_review_join_topk(shop):
    p = _match(shop["products"], shop["p"],
               ast.Parse("product", field="description")).alias("p")
    r = shop["reviews"].filter(F.col("rating") >= 4).alias("r")
    got = (p.join(r, F.col("p.id") == F.col("r.product_id"))
           .select(F.col("p.name"), F.col("r.rating"), F.col("r.content"),
                   F.col("r.id"))
           .orderBy(F.col("r.helpful_votes").desc(), F.col("r.id").asc())
           .limit(5).collect())
    assert [tuple(r)[:3] for r in got] == [
        ("Product 10", 5, "Terrible product, complete waste of money!"),
        ("Product 20", 5, "Terrible product, complete waste of money!"),
        ("Product 10", 5, "Terrible product, complete waste of money!"),
        ("Product 20", 5, "Terrible product, complete waste of money!"),
        ("Product 9", 4, "Not very impressed, could be better.")]


def test_three_branch_typed_union(shop):
    pq = ast.Boolean(should=[ast.Parse("10", field="name"),
                             ast.Parse("feature", field="description")])
    p = _match(shop["products"], shop["p"], pq) \
        .select(F.lit("Product").alias("type"),
                F.col("name").alias("item_name"),
                F.col("description").alias("content"))
    c = _match(shop["categories"], shop["c"], ast.Parse("e", field="name")) \
        .select(F.lit("Category").alias("type"),
                F.col("name").alias("item_name"),
                F.col("description").alias("content"))
    r = _match(shop["reviews"], shop["r"],
               ast.Parse("great", field="content")) \
        .select(F.lit("Review").alias("type"),
                F.col("reviewer_name").alias("item_name"),
                F.col("content"))
    got = p.unionAll(c).unionAll(r).orderBy("type", "item_name").collect()
    # 'feature' ≠ 'features' (no stemming) and no category tokenizes to
    # bare 'e' → 1 product + 0 categories + 40 'great' reviews
    assert len(got) == 41
    assert tuple(got[0]) == (
        "Product", "Product 10",
        "Description for product 10. This product has various features "
        "and specifications.")
    reviewers = [r["item_name"] for r in got[1:]]
    assert reviewers == sorted(reviewers)
    assert [r for r in got[1:] if r["type"] != "Review"] == []
    expected_reviewers = sorted(
        [f"Reviewer {n}" for n in (1, 6, 11, 16, 21, 26, 31, 36, 41, 46)] * 4)
    assert reviewers == expected_reviewers


def test_in_subquery_across_indexes(shop):
    cm = _match(shop["categories"], shop["c"],
                ast.Parse("electronics OR clothing", field="name"))
    pids = shop["pc"].join(cm.select(F.col("id").alias("cid")),
                           F.col("category_id") == F.col("cid"),
                           "left_semi").select("product_id").distinct()
    got = (shop["products"]
           .join(pids, shop["products"]["id"] == pids["product_id"],
                 "left_semi")
           .filter((F.col("stock_count") > 50) & (F.col("price") < 500))
           .select("name", "price", "stock_count")
           .orderBy("price").collect())
    assert [tuple(r) for r in got] == [
        ("Product 27", 320.0, 54), ("Product 30", 350.0, 60),
        ("Product 32", 370.0, 64), ("Product 40", 450.0, 80),
        ("Product 42", 470.0, 84)]


def test_left_join_review_case_buckets(shop):
    avg_r = (shop["reviews"].groupBy("product_id")
             .agg(F.avg("rating").alias("rating")))
    p = _match(shop["products"], shop["p"],
               ast.Parse("Product", field="name")) \
        .filter(F.col("is_available") & F.col("price").between(200, 600))
    joined = p.join(avg_r, p["id"] == avg_r["product_id"], "left")
    status = (F.when(F.col("rating").isNull(), "No reviews")
              .when(F.col("rating") < 3, "Poor reviews")
              .when(F.col("rating") < 4, "Average reviews")
              .otherwise("Great reviews"))
    got = (joined.select("name", "price", status.alias("review_status"),
                         F.coalesce(F.col("rating"), F.lit(0)).alias("_k"))
           .orderBy(F.col("_k").desc(), F.col("price").asc())
           .drop("_k").collect())
    assert len(got) == 32
    assert [tuple(r) for r in got[:4]] == [
        ("Product 19", 240.0, "Great reviews"),
        ("Product 18", 230.0, "Average reviews"),
        ("Product 17", 220.0, "Poor reviews"),
        ("Product 16", 210.0, "Poor reviews")]
    rest = got[4:]
    assert all(r["review_status"] == "No reviews" for r in rest)
    assert [r["name"] for r in rest[:6]] == [
        "Product 21", "Product 22", "Product 23", "Product 24",
        "Product 26", "Product 27"]
    assert [r["name"] for r in rest[-4:]] == [
        "Product 51", "Product 52", "Product 53", "Product 54"]
