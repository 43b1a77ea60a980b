"""join_multi_table.out golden (PUBLIC reference behavior, tables
replicated inline): joins over 3+ tables — star and chain schemas —
with the search predicate at any level, cross-table OR with and without
LIMIT, non-fast-field join keys (the reference falls back to a standard
join; Catalyst plans it either way), and ORDER BY score of the nested
or outer relation.  Scores are the reference's printed float32 values.

Ref: pg_search/tests/pg_regress/expected/join_multi_table.out
"""

from decimal import Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

from test_join_basic_golden import PRODUCTS, SUPPLIERS


def _f32(x):
    return np.float32(x)


CATEGORY_OF = {201: 301, 203: 301, 205: 301, 206: 301,
               202: 302, 204: 302, 208: 302, 207: 303}
CATEGORIES_V1 = [(301, "Electronics", "Electronic devices and accessories"),
                 (302, "Office", "Office supplies and equipment"),
                 (303, "Gaming", "Gaming peripherals and accessories")]


@pytest.fixture(scope="module")
def shop(spark):
    products = spark.createDataFrame(
        [(i, n, d, s, Decimal(p), CATEGORY_OF[i])
         for i, n, d, s, p in PRODUCTS],
        "id int, name string, description string, supplier_id int, "
        "price decimal(10,2), category_id int")
    suppliers = spark.createDataFrame(
        SUPPLIERS, "id int, name string, contact_info string, country string")
    categories = spark.createDataFrame(
        CATEGORIES_V1, "id int, name string, description string")
    p_idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    s_idx = build_index(suppliers, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="contact_info"),
                                     FieldConfig(name="country")]))
    return products, suppliers, categories, p_idx, s_idx


def test_1_three_table_join_non_fast_key(shop):
    """TEST 1: category_id is not a fast field in the reference (falls
    back to a standard join level); the joined rows are the contract."""
    products, suppliers, categories, p_idx, _ = shop
    m = compile_query(p_idx, ast.Parse("wireless", field="description")) \
        .select("doc_id")
    p = products.join(m, products["id"] == F.col("doc_id")) \
                .drop("doc_id").alias("p")
    got = (p.join(suppliers.alias("s"),
                  F.col("p.supplier_id") == F.col("s.id"))
           .join(categories.alias("c"),
                 F.col("p.category_id") == F.col("c.id"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   F.col("c.name").alias("category_name"))
           .orderBy("id").limit(5).collect())
    assert [tuple(r) for r in got] == [
        (201, "Wireless Mouse", "TechCorp", "Electronics"),
        (206, "Headphones", "TechCorp", "Electronics"),
        (207, "Mouse Pad", "GlobalSupply", "Gaming")]


def _or_across_tables(shop, limit=None):
    products, suppliers, _, p_idx, s_idx = shop
    pm = compile_query(p_idx, ast.Parse("wireless", field="description")) \
        .select(F.col("doc_id").alias("p_k"))
    sm = compile_query(s_idx, ast.Parse("wireless", field="contact_info")) \
        .select(F.col("doc_id").alias("s_k"))
    j = (products.alias("p")
         .join(suppliers.alias("s"),
               F.col("p.supplier_id") == F.col("s.id"))
         .join(pm, F.col("p.id") == F.col("p_k"), "left")
         .join(sm, F.col("s.id") == F.col("s_k"), "left")
         .filter(F.col("p_k").isNotNull() | F.col("s_k").isNotNull())
         .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
         .orderBy("id"))
    return j.limit(limit) if limit else j


def test_2_or_across_tables_no_limit(shop):
    got = [tuple(r) for r in _or_across_tables(shop).collect()]
    assert got == [
        (201, "Wireless Mouse", "TechCorp"),
        (203, "Keyboard", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]


def test_3_or_across_tables_with_limit(shop):
    got = [tuple(r) for r in _or_across_tables(shop, limit=10).collect()]
    assert got == [
        (201, "Wireless Mouse", "TechCorp"),
        (203, "Keyboard", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]


# --- TEST 4: star schema (fresh corpus) --------------------------------------

STAR_CATS = [(10, "Electronics"), (11, "Accessories"), (12, "Office")]
STAR_SUPS = [
    (151, "TechCorp", "contact@techcorp.com wireless technology", "USA"),
    (152, "GlobalSupply", "info@globalsupply.com international shipping",
     "UK"),
    (153, "FastParts", "sales@fastparts.com quick delivery", "Germany"),
]
STAR_PRODS = [
    (201, "Wireless Mouse", "Ergonomic wireless mouse", 151, 11, "29.99"),
    (202, "USB Cable", "High-speed USB-C cable", 152, 11, "9.99"),
    (203, "Keyboard", "Mechanical keyboard", 151, 10, "89.99"),
    (204, "Monitor Stand", "Adjustable monitor stand", 153, 12, "49.99"),
    (206, "Headphones", "Wireless noise-canceling headphones", 151, 10,
     "199.99"),
    (207, "Mouse Pad", "Large gaming mouse pad", 152, 11, "29.99"),
]


@pytest.fixture(scope="module")
def star(spark):
    categories = spark.createDataFrame(STAR_CATS, "id int, name string")
    suppliers = spark.createDataFrame(
        STAR_SUPS, "id int, name string, contact_info string, country string")
    products = spark.createDataFrame(
        [(i, n, d, s, c, Decimal(p)) for i, n, d, s, c, p in STAR_PRODS],
        "id int, name string, description string, supplier_id int, "
        "category_id int, price decimal(10,2)")
    p_idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    s_idx = build_index(suppliers, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="contact_info"),
                                     FieldConfig(name="country")]))
    return products, suppliers, categories, p_idx, s_idx


def _star_join(star, scores, on_products=True):
    products, suppliers, categories, p_idx, s_idx = star
    if on_products:
        m = compile_query(p_idx,
                          ast.Parse("wireless", field="description"))
        base = products.join(m.select("doc_id", "score"),
                             products["id"] == F.col("doc_id")) \
                       .drop("doc_id").alias("p")
        s = suppliers.alias("s")
    else:
        m = compile_query(s_idx,
                          ast.Parse("wireless", field="contact_info"))
        s = suppliers.join(m.select("doc_id", "score"),
                           suppliers["id"] == F.col("doc_id")) \
                     .drop("doc_id").alias("s")
        base = products.alias("p")
    return (base.join(s, F.col("p.supplier_id") == F.col("s.id"))
            .join(categories.alias("c"),
                  F.col("p.category_id") == F.col("c.id")))


def test_4_star_predicate_on_products(star):
    got = (_star_join(star, scores=False)
           .select(F.col("p.name").alias("product"),
                   F.col("s.name").alias("supplier"),
                   F.col("c.name").alias("category"), "p.id")
           .orderBy("id").limit(10).collect())
    assert [(r["product"], r["supplier"], r["category"]) for r in got] == [
        ("Wireless Mouse", "TechCorp", "Accessories"),
        ("Headphones", "TechCorp", "Electronics")]


def test_4_star_predicate_on_suppliers(star):
    got = (_star_join(star, scores=False, on_products=False)
           .select(F.col("p.name").alias("product"),
                   F.col("s.name").alias("supplier"),
                   F.col("c.name").alias("category"), "p.id")
           .orderBy("id").limit(10).collect())
    assert [(r["product"], r["supplier"], r["category"]) for r in got] == [
        ("Wireless Mouse", "TechCorp", "Accessories"),
        ("Keyboard", "TechCorp", "Electronics"),
        ("Headphones", "TechCorp", "Electronics")]


def test_4_order_by_nested_relation_score(star):
    got = (_star_join(star, scores=True)
           .select(F.col("p.name").alias("name"), "score")
           .orderBy(F.col("score").desc()).limit(5).collect())
    assert [(r["name"], _f32(r["score"])) for r in got] == [
        ("Wireless Mouse", _f32(1.0935268)),
        ("Headphones", _f32(0.9727693))]


def test_4_order_by_outer_relation_score(star):
    got = (_star_join(star, scores=True, on_products=False)
           .select(F.col("s.name").alias("name"), "score")
           .orderBy(F.col("score").desc()).limit(5).collect())
    assert [(r["name"], _f32(r["score"])) for r in got] == \
        [("TechCorp", _f32(0.9808292))] * 3


# --- TEST 5/6: chain schema (4 tables) ---------------------------------------

@pytest.fixture(scope="module")
def chain(spark):
    l1 = spark.createDataFrame([(1, 1, "L1-A"), (2, 2, "L1-B")],
                               "id int, l2_id int, name string")
    l2 = spark.createDataFrame([(1, 1, "L2-A"), (2, 2, "L2-B")],
                               "id int, l3_id int, name string")
    l3 = spark.createDataFrame([(1, 1, "L3-A"), (2, 2, "L3-B")],
                               "id int, l4_id int, name string")
    l4 = spark.createDataFrame(
        [(1, "L4-A", "Deepest level item"), (2, "L4-B", "Another deep item")],
        "id int, name string, description string")
    idx = {}
    for tag, df, fields in [
            ("l1", l1, ["name"]), ("l2", l2, ["name"]),
            ("l3", l3, ["name"]),
            ("l4", l4, ["name", "description"])]:
        idx[tag] = build_index(df, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name=f) for f in fields]))
    return l1, l2, l3, l4, idx


def _chain_join(chain):
    l1, l2, l3, l4, _ = chain
    return (l1.alias("l1")
            .join(l2.alias("l2"), F.col("l1.l2_id") == F.col("l2.id"))
            .join(l3.alias("l3"), F.col("l2.l3_id") == F.col("l3.id"))
            .join(l4.alias("l4"), F.col("l3.l4_id") == F.col("l4.id")))


def _keys(idx, q):
    return compile_query(idx, q).select("doc_id")


def test_5_chain_driving_predicate_deepest(chain):
    *_, idx = chain
    m = _keys(idx["l4"], ast.Parse("deepest", field="description"))
    got = (_chain_join(chain)
           .join(m, F.col("l4.id") == F.col("doc_id"))
           .select(F.col("l1.name").alias("n1"),
                   F.col("l2.name").alias("n2"),
                   F.col("l3.name").alias("n3"),
                   F.col("l4.name").alias("n4"))
           .orderBy(F.col("l1.id")).limit(5).collect())
    assert [tuple(r) for r in got] == [("L1-A", "L2-A", "L3-A", "L4-A")]


def test_6_chain_mixed_outer_inner_predicates(chain):
    *_, idx = chain
    m1 = _keys(idx["l1"], ast.Parse("L1-A", field="name")) \
        .withColumnRenamed("doc_id", "k1")
    m4 = _keys(idx["l4"], ast.Parse("deepest", field="description")) \
        .withColumnRenamed("doc_id", "k4")
    got = (_chain_join(chain)
           .join(m1, F.col("l1.id") == F.col("k1"))
           .join(m4, F.col("l4.id") == F.col("k4"))
           .select(F.col("l1.name").alias("n1"),
                   F.col("l4.name").alias("n4"))
           .orderBy(F.col("l1.id")).limit(5).collect())
    assert [tuple(r) for r in got] == [("L1-A", "L4-A")]


def test_6_chain_intermediate_predicates(chain):
    *_, idx = chain
    m2 = _keys(idx["l2"], ast.Parse("L2-B", field="name")) \
        .withColumnRenamed("doc_id", "k2")
    m3 = _keys(idx["l3"], ast.Parse("L3-B", field="name")) \
        .withColumnRenamed("doc_id", "k3")
    got = (_chain_join(chain)
           .join(m2, F.col("l2.id") == F.col("k2"))
           .join(m3, F.col("l3.id") == F.col("k3"))
           .select(F.col("l1.name").alias("n1"),
                   F.col("l4.name").alias("n4"))
           .orderBy(F.col("l1.id")).limit(5).collect())
    assert [tuple(r) for r in got] == [("L1-B", "L4-B")]
