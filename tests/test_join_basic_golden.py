"""join_basic.out golden (PUBLIC reference behavior, tables replicated
inline): the JoinScan planner's basic result semantics — inner joins
driven by a search predicate on either side, TopK ORDER BY over join-key
and fast-field columns, LEFT-join equivalence when every key matches,
non-equijoin fallback row sets, cross joins, and mixed-case column
names through join keys and sorts.

Plan-shape sections of the golden (JoinScan vs HashJoin selection, GUC
toggling) are Postgres planner internals with no Spark analog — Catalyst
always plans these joins; the result rows are what this port pins.

Ref: pg_search/tests/pg_regress/expected/join_basic.out
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

SUPPLIERS = [
    (151, "TechCorp", "contact@techcorp.com wireless technology", "USA"),
    (152, "GlobalSupply", "info@globalsupply.com international shipping",
     "UK"),
    (153, "FastParts", "sales@fastparts.com quick delivery", "Germany"),
    (154, "QualityFirst", "quality@first.com premium products", "Japan"),
]
PRODUCTS = [
    (201, "Wireless Mouse",
     "Ergonomic wireless mouse with Bluetooth connectivity", 151, "29.99"),
    (202, "USB Cable", "High-speed USB-C cable for fast data transfer",
     152, "9.99"),
    (203, "Keyboard", "Mechanical keyboard with RGB lighting", 151, "89.99"),
    (204, "Monitor Stand", "Adjustable monitor stand for ergonomic setup",
     153, "49.99"),
    (205, "Webcam", "HD webcam for video conferencing", 154, "59.99"),
    (206, "Headphones",
     "Wireless noise-canceling headphones with premium sound", 151,
     "199.99"),
    (207, "Mouse Pad", "Large gaming mouse pad with wireless charging",
     152, "39.69"),
    (208, "Cable Organizer", "Desktop cable organizer for clean setup",
     153, "14.99"),
]


@pytest.fixture(scope="module")
def shop(spark):
    products = spark.createDataFrame(
        [(i, n, d, s, Decimal(p)) for i, n, d, s, p in PRODUCTS],
        "id int, name string, description string, supplier_id int, "
        "price decimal(10,2)")
    suppliers = spark.createDataFrame(
        SUPPLIERS, "id int, name string, contact_info string, country string")
    p_idx = build_index(products, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description")]))
    s_idx = build_index(suppliers, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="contact_info"),
                     FieldConfig(name="country")]))
    return products, suppliers, p_idx, s_idx


def _products_matching(shop, field, text):
    products, _, p_idx, _ = shop
    m = compile_query(p_idx, ast.Parse(text, field=field)).select("doc_id")
    return products.join(m, products["id"] == m["doc_id"]).drop("doc_id")


def _join(shop, matched, how="inner"):
    _, suppliers, _, _ = shop
    p = matched.alias("p")
    s = suppliers.alias("s")
    return p.join(s, F.col("p.supplier_id") == F.col("s.id"), how)


def test_inner_join_wireless_ordered(shop):
    """TEST 1/2: description @@@ 'wireless' JOIN suppliers ORDER BY p.id
    LIMIT 10 — 3 rows (207's description mentions wireless charging)."""
    got = (_join(shop, _products_matching(shop, "description", "wireless"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(10).collect())
    assert [tuple(r) for r in got] == [
        (201, "Wireless Mouse", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]


def test_predicate_one_side_keyboard(shop):
    """TEST 3: predicate only on products."""
    got = (_join(shop, _products_matching(shop, "description", "keyboard"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(5).collect())
    assert [tuple(r) for r in got] == [(203, "Keyboard", "TechCorp")]


def test_predicate_on_supplier_side_order_by_supplier_key(shop):
    """TEST 3b: search on suppliers.contact_info, ORDER BY s.id (not in
    the target list).  Only TechCorp(151) matches 'wireless', so all
    three product rows tie on the sort key — the golden's row order
    within the tie is ctid order; the row SET is the contract."""
    products, suppliers, _, s_idx = shop
    m = compile_query(s_idx,
                      ast.Parse("wireless", field="contact_info")
                      ).select("doc_id")
    s = suppliers.join(m, suppliers["id"] == m["doc_id"]) \
                 .drop("doc_id").alias("s")
    p = products.alias("p")
    got = (p.join(s, F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   F.col("s.id").alias("sid"))
           .orderBy("sid").limit(5).collect())
    assert len(got) == 3
    assert {(r["id"], r["name"], r["supplier_name"]) for r in got} == {
        (203, "Keyboard", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (201, "Wireless Mouse", "TechCorp")}


def test_left_join_equals_inner_when_all_keys_match(shop):
    """TEST 4: LEFT JOIN with every supplier_id present — same rows as
    the inner join (the golden plans it through JoinScan as s RIGHT p)."""
    got = (_join(shop, _products_matching(shop, "description", "wireless"),
                 "left")
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(10).collect())
    assert [tuple(r) for r in got] == [
        (201, "Wireless Mouse", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]


def test_non_equijoin_range_condition(shop):
    """TEST 6: ON p.supplier_id >= s.id AND p.supplier_id <= s.id + 1 —
    no equi-key, falls back to a theta join; product 207 (supplier 152)
    matches both TechCorp(151) and GlobalSupply(152)."""
    _, suppliers, _, _ = shop
    p = _products_matching(shop, "description", "wireless").alias("p")
    s = suppliers.alias("s")
    got = (p.join(s, (F.col("p.supplier_id") >= F.col("s.id")) &
                  (F.col("p.supplier_id") <= F.col("s.id") + 1))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   F.col("s.id").alias("sid"))
           .orderBy("id", "sid").limit(10).collect())
    assert [(r["id"], r["name"], r["supplier_name"]) for r in got] == [
        (201, "Wireless Mouse", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (207, "Mouse Pad", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]


def test_limit_exceeds_matches(shop):
    """TEST 7a: 'mouse' matches 2 products; LIMIT 3 returns both."""
    got = (_join(shop, _products_matching(shop, "description", "mouse"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(3).collect())
    assert [tuple(r) for r in got] == [
        (201, "Wireless Mouse", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]


def test_order_by_fast_field_price_desc(shop):
    """TEST 7b: ORDER BY the decimal fast field price DESC."""
    got = (_join(shop, _products_matching(shop, "description", "mouse"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   "p.price")
           .orderBy(F.col("price").desc()).limit(3).collect())
    assert [(r["id"], r["name"], r["supplier_name"]) for r in got] == [
        (207, "Mouse Pad", "GlobalSupply"),
        (201, "Wireless Mouse", "TechCorp")]
    assert [r["price"] for r in got] == [Decimal("39.69"), Decimal("29.99")]


def test_cross_join_search_both_sides(spark):
    """TEST 8: cross join (no equi-keys) with search predicates on both
    sides — 3 colors x 3 sizes, ordered by (c.id, s.id)."""
    colors = spark.createDataFrame(
        [(1, "Red", "Bright red color"), (2, "Blue", "Ocean blue color"),
         (3, "Green", "Forest green color")],
        "id int, name string, description string")
    sizes = spark.createDataFrame(
        [(10, "Small", "Small size for compact items"),
         (20, "Medium", "Medium size for average items"),
         (30, "Large", "Large size for big items")],
        "id int, name string, description string")
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="name"),
                                      FieldConfig(name="description")])
    c_idx = build_index(colors, schema)
    s_idx = build_index(sizes, schema)
    cm = compile_query(c_idx, ast.Parse("color", field="description")) \
        .select("doc_id")
    sm = compile_query(s_idx, ast.Parse("size", field="description")) \
        .select("doc_id")
    c = colors.join(cm, colors["id"] == cm["doc_id"]).drop("doc_id") \
              .alias("c")
    s = sizes.join(sm, sizes["id"] == sm["doc_id"]).drop("doc_id").alias("s")
    got = (c.crossJoin(s)
           .select(F.col("c.name").alias("color"),
                   F.col("s.name").alias("size"),
                   F.col("c.id").alias("cid"), F.col("s.id").alias("sid"))
           .orderBy("cid", "sid").limit(10).collect())
    assert [(r["color"], r["size"]) for r in got] == [
        ("Red", "Small"), ("Red", "Medium"), ("Red", "Large"),
        ("Blue", "Small"), ("Blue", "Medium"), ("Blue", "Large"),
        ("Green", "Small"), ("Green", "Medium"), ("Green", "Large")]


def test_mixed_case_column_names(spark, shop):
    """TEST 9: mixed-case identifiers through join keys and the sort —
    "MixedCaseTable"("ID","Content","JoinKey") joined to suppliers."""
    _, suppliers, _, _ = shop
    mixed = spark.createDataFrame([(1, "wireless", 151)],
                                  "`ID` int, `Content` string, `JoinKey` int")
    m_idx = build_index(mixed, IndexSchema(
        key_field="ID", text_fields=[FieldConfig(name="Content")]))
    mm = compile_query(m_idx, ast.Parse("wireless", field="Content")) \
        .select("doc_id")
    m = mixed.join(mm, mixed["ID"] == mm["doc_id"]).drop("doc_id").alias("m")
    s = suppliers.alias("s")
    got = (m.join(s, F.col("m.JoinKey") == F.col("s.id"))
           .select("m.Content", "s.name", F.col("m.ID").alias("mid"))
           .orderBy("mid").limit(5).collect())
    assert [(r["Content"], r["name"]) for r in got] == \
        [("wireless", "TechCorp")]
