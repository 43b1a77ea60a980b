"""filter_pushdown_datafusion.out golden (PUBLIC reference behavior):
cross-table OR/AND/NOT boolean join predicates — `(p.description @@@ X
OR s.description @@@ Y)` and nested combinations cannot be pushed to
either single-table scan, so the join evaluates the boolean over
per-side match flags; single-table conjuncts (price/stock ranges) still
push to their own side.

Spark restatement: each side's match set compiles independently
(bucket-pruned postings scans); flags join in as booleans and the
cross-table predicate is a plain codegen'd filter above the join —
the JoinScan "Join Predicate" shape.

Ref: pg_search/tests/pg_regress/expected/filter_pushdown_datafusion.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop", "High performance laptop computer", 1, 999.99, 10),
    (2, "Mouse", "Wireless ergonomic mouse", 1, 49.99, 100),
    (3, "Keyboard", "Mechanical gaming keyboard", 1, 129.99, 50),
    (4, "Monitor", "Ultra-wide curved monitor", 2, 599.99, 25),
    (5, "Webcam", "HD webcam for video calls", 2, 79.99, 75),
    (6, "Headphones", "Noise canceling headphones", 3, 299.99, 30),
    (7, "Microphone", "USB condenser microphone", 3, 149.99, 40),
    (8, "Speaker", "Bluetooth portable speaker", 4, 89.99, 60),
    (9, "Tablet", "Android tablet device", 4, 449.99, 20),
    (10, "Charger", "Fast charging USB-C charger", 5, 29.99, 200),
]
SUPPLIERS = [
    (1, "TechCorp", "Leading technology manufacturer", "USA", 5),
    (2, "DisplayPro", "Premium display solutions", "Japan", 4),
    (3, "AudioMax", "Professional audio equipment", "Germany", 5),
    (4, "GadgetWorld", "Consumer electronics retailer", "China", 3),
    (5, "PowerTech", "Power and charging solutions", "USA", 4),
]


@pytest.fixture(scope="module")
def shop(spark):
    p = spark.createDataFrame(
        PRODUCTS, "id int, name string, description string, "
                  "supplier_id int, price double, stock int")
    s = spark.createDataFrame(
        SUPPLIERS, "id int, name string, description string, "
                   "country string, rating int")
    p_idx = build_index(p, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description")],
        numeric_fields=["supplier_id", "price", "stock"]))
    s_idx = build_index(s, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description"),
                     FieldConfig(name="country")],
        numeric_fields=["rating"]))
    return p, s, p_idx, s_idx


def _flag(idx, qstr, tag):
    return compile_query(idx, ast.Parse(qstr, field="description")) \
        .select(F.col("doc_id").alias(f"{tag}_k"))


def _joined(shop_fix, p_terms, s_terms):
    """Join with one boolean flag column per search term."""
    p, s, p_idx, s_idx = shop_fix
    j = p.alias("p").join(
        s.select(F.col("id").alias("sid"),
                 F.col("name").alias("supplier_name"),
                 F.col("description").alias("s_desc")),
        F.col("p.supplier_id") == F.col("sid"))
    for i, t in enumerate(p_terms):
        m = _flag(p_idx, t, f"p{i}")
        j = (j.join(m, F.col("p.id") == F.col(f"p{i}_k"), "left")
             .withColumn(f"p{i}", F.col(f"p{i}_k").isNotNull())
             .drop(f"p{i}_k"))
    for i, t in enumerate(s_terms):
        m = _flag(s_idx, t, f"s{i}")
        j = (j.join(m, F.col("sid") == F.col(f"s{i}_k"), "left")
             .withColumn(f"s{i}", F.col(f"s{i}_k").isNotNull())
             .drop(f"s{i}_k"))
    return j


def _rows(df):
    got = df.orderBy("id").limit(10) \
        .select("id", "name", "supplier_name").collect()
    return [(r["id"], r["name"], r["supplier_name"]) for r in got]


def test_1_simple_cross_table_or(shop):
    j = _joined(shop, ["laptop"], ["technology"])
    assert _rows(j.filter("p0 OR s0")) == [
        (1, "Laptop", "TechCorp"), (2, "Mouse", "TechCorp"),
        (3, "Keyboard", "TechCorp")]


def test_2_or_with_parse_disjunctions(shop):
    j = _joined(shop, ["monitor OR webcam"], ["display OR premium"])
    assert _rows(j.filter("p0 OR s0")) == [
        (4, "Monitor", "DisplayPro"), (5, "Webcam", "DisplayPro")]


def test_3_or_with_single_table_and(shop):
    j = _joined(shop, ["laptop OR keyboard"], ["technology"])
    assert _rows(j.filter("price > 100 AND (p0 OR s0)")) == [
        (1, "Laptop", "TechCorp"), (3, "Keyboard", "TechCorp")]


def test_4_multiple_or_arms(shop):
    j = _joined(shop, ["laptop", "monitor"], ["professional"])
    assert _rows(j.filter("p0 OR p1 OR s0")) == [
        (1, "Laptop", "TechCorp"), (4, "Monitor", "DisplayPro"),
        (6, "Headphones", "AudioMax"), (7, "Microphone", "AudioMax")]


def test_5_or_with_range_filter(shop):
    j = _joined(shop, ["laptop OR monitor OR headphones"],
                ["audio OR display"])
    assert _rows(j.filter("stock >= 25 AND (p0 OR s0)")) == [
        (4, "Monitor", "DisplayPro"), (5, "Webcam", "DisplayPro"),
        (6, "Headphones", "AudioMax"), (7, "Microphone", "AudioMax")]


def test_6_nested_cross_table_boolean(shop):
    j = _joined(shop, ["laptop", "keyboard", "computer"], ["technology"])
    assert _rows(j.filter("(p0 OR p1) AND (p2 OR s0)")) == [
        (1, "Laptop", "TechCorp"), (3, "Keyboard", "TechCorp")]


def test_7_deeply_nested_with_not(shop):
    j = _joined(shop, ["keyboard", "headphones", "wireless"],
                ["professional"])
    assert _rows(j.filter("p0 OR (p1 OR (s0 AND NOT p2))")) == [
        (3, "Keyboard", "TechCorp"), (6, "Headphones", "AudioMax"),
        (7, "Microphone", "AudioMax")]


def test_8_cross_table_and(shop):
    j = _joined(shop, ["laptop OR headphones"], ["technology OR audio"])
    assert _rows(j.filter("p0 AND s0")) == [
        (1, "Laptop", "TechCorp"), (6, "Headphones", "AudioMax")]


def test_9_nested_and_pairs(shop):
    j = _joined(shop, ["laptop", "headphones"], ["technology", "audio"])
    assert _rows(j.filter("(p0 AND s0) OR (p1 AND s1)")) == [
        (1, "Laptop", "TechCorp"), (6, "Headphones", "AudioMax")]


def test_10_not_with_cross_table(shop):
    j = _joined(shop, ["wireless"], ["technology"])
    got = _rows(j.filter("(NOT p0) OR s0"))
    assert got == [
        (1, "Laptop", "TechCorp"), (2, "Mouse", "TechCorp"),
        (3, "Keyboard", "TechCorp"), (4, "Monitor", "DisplayPro"),
        (5, "Webcam", "DisplayPro"), (6, "Headphones", "AudioMax"),
        (7, "Microphone", "AudioMax"), (8, "Speaker", "GadgetWorld"),
        (9, "Tablet", "GadgetWorld"), (10, "Charger", "PowerTech")]
