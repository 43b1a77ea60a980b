"""join_distinct.out golden (PUBLIC reference behavior, tables
replicated inline — issue #4213): DISTINCT through search-filtered
joins — non-DISTINCT duplicates (TechCorp ×4) collapse to the pinned
distinct row sets, DISTINCT composes with scores (0.7199212 /
0.6763775, float32-exact), with and without ORDER BY, and across a
3-table star join.

Ref: pg_search/tests/pg_regress/expected/join_distinct.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

SUPPLIERS = [(151, "TechCorp"), (152, "GlobalSupply"),
             (153, "FastParts"), (154, "QualityFirst")]
CATEGORIES = [(301, "Electronics"), (302, "Accessories"), (303, "Office")]
PRODUCTS = [
    (201, "Wireless Mouse",
     "Ergonomic wireless mouse with Bluetooth connectivity", 151, 302),
    (202, "USB Cable",
     "High-speed USB-C cable for fast data transfer", 152, 302),
    (203, "Keyboard",
     "Mechanical keyboard with RGB lighting wireless", 151, 301),
    (204, "Monitor Stand",
     "Adjustable monitor stand for ergonomic setup", 153, 303),
    (205, "Webcam", "HD webcam for video conferencing", 154, 301),
    (206, "Headphones",
     "Wireless noise-canceling headphones with premium sound", 151, 301),
    (207, "Mouse Pad",
     "Large gaming mouse pad with wireless charging", 152, 302),
    (208, "Cable Organizer",
     "Desktop cable organizer for clean setup", 153, 303),
    (209, "Wireless Charger",
     "Fast wireless charging pad for smartphones", 151, 301),
    (210, "USB Hub",
     "Multi-port USB hub for data transfer connectivity", 152, 302),
]


@pytest.fixture(scope="module")
def dist(spark):
    suppliers = spark.createDataFrame(SUPPLIERS,
                                      "id long, supplier_name string")
    categories = spark.createDataFrame(CATEGORIES,
                                       "id long, category_name string")
    products = spark.createDataFrame(
        PRODUCTS, "id long, name string, description string, "
                  "supplier_id long, category_id long")
    pidx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    return pidx, products, suppliers, categories


def _wireless(pidx):
    return compile_query(pidx, ast.Parse("wireless",
                                         field="description"))


def test_non_distinct_duplicates(dist):
    pidx, products, suppliers, _ = dist
    m = _wireless(pidx).select("doc_id")
    j = (products.join(m, products["id"] == m["doc_id"], "left_semi")
         .join(F.broadcast(suppliers.withColumnRenamed("id", "sid")),
               F.col("supplier_id") == F.col("sid")))
    rows = (j.orderBy("supplier_name").limit(20)
            .select("supplier_name").collect())
    assert [r[0] for r in rows] == \
        ["GlobalSupply", "TechCorp", "TechCorp", "TechCorp", "TechCorp"]


def test_distinct_collapses(dist):
    pidx, products, suppliers, _ = dist
    m = _wireless(pidx).select("doc_id")
    j = (products.join(m, products["id"] == m["doc_id"], "left_semi")
         .join(F.broadcast(suppliers.withColumnRenamed("id", "sid")),
               F.col("supplier_id") == F.col("sid")))
    rows = (j.select("supplier_name").distinct()
            .orderBy("supplier_name").limit(10).collect())
    assert [r[0] for r in rows] == ["GlobalSupply", "TechCorp"]


def test_distinct_two_columns(dist):
    pidx, products, suppliers, _ = dist
    m = _wireless(pidx).select("doc_id")
    j = (products.join(m, products["id"] == m["doc_id"], "left_semi")
         .join(F.broadcast(suppliers.withColumnRenamed("id", "sid")),
               F.col("supplier_id") == F.col("sid")))
    rows = (j.select("name", "supplier_name").distinct()
            .orderBy("name").limit(10).collect())
    assert [(r[0], r[1]) for r in rows] == [
        ("Headphones", "TechCorp"), ("Keyboard", "TechCorp"),
        ("Mouse Pad", "GlobalSupply"), ("Wireless Charger", "TechCorp"),
        ("Wireless Mouse", "TechCorp")]


def test_distinct_with_score(dist):
    pidx, products, suppliers, _ = dist
    m = _wireless(pidx)
    j = (products.join(m, products["id"] == m["doc_id"])
         .join(F.broadcast(suppliers.withColumnRenamed("id", "sid")),
               F.col("supplier_id") == F.col("sid")))
    rows = (j.select("name", "score").distinct()
            .orderBy(F.col("score").desc(), F.col("name").asc())
            .limit(10).collect())
    got = [(r["name"], np.float32(r["score"])) for r in rows]
    hi, lo = np.float32("0.7199212"), np.float32("0.6763775")
    assert got == [("Keyboard", hi), ("Wireless Charger", hi),
                   ("Wireless Mouse", hi), ("Headphones", lo),
                   ("Mouse Pad", lo)]


def test_three_table_star_distinct(dist):
    pidx, products, suppliers, categories = dist
    m = _wireless(pidx).select("doc_id")
    j = (products.join(m, products["id"] == m["doc_id"], "left_semi")
         .join(F.broadcast(suppliers.withColumnRenamed("id", "sid")),
               F.col("supplier_id") == F.col("sid"))
         .join(F.broadcast(categories.withColumnRenamed("id", "cid")),
               F.col("category_id") == F.col("cid")))
    rows = (j.select(F.col("name").alias("product"),
                     F.col("supplier_name").alias("supplier"),
                     F.col("category_name").alias("category"))
            .distinct().orderBy("product").limit(10).collect())
    assert [(r[0], r[1], r[2]) for r in rows] == [
        ("Headphones", "TechCorp", "Electronics"),
        ("Keyboard", "TechCorp", "Electronics"),
        ("Mouse Pad", "GlobalSupply", "Accessories"),
        ("Wireless Charger", "TechCorp", "Electronics"),
        ("Wireless Mouse", "TechCorp", "Accessories")]
