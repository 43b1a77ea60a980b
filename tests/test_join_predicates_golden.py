"""join_predicates.out golden (PUBLIC reference behavior): complex
boolean expressions across a two-table join — side-level vs join-level
predicates, NOT/OR nesting, multi-table fast-field comparisons, and
functions inside cross-table predicates.

products (201-208) ⋈ suppliers (151-154) on supplier_id; every
expected row set is the golden's printed output.

Ref: pg_search/tests/pg_regress/expected/join_predicates.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

SUPPLIERS = [
    (151, "TechCorp", "contact@techcorp.com wireless technology", "USA",
     50.00),
    (152, "GlobalSupply", "info@globalsupply.com international shipping",
     "UK", 15.00),
    (153, "FastParts", "sales@fastparts.com quick delivery", "Germany",
     30.00),
    (154, "QualityFirst", "quality@first.com premium products", "Japan",
     100.00),
]
PRODUCTS = [
    (201, "Wireless Mouse",
     "Ergonomic wireless mouse with Bluetooth connectivity", 151, 29.99),
    (202, "USB Cable", "High-speed USB-C cable for fast data transfer",
     152, 9.99),
    (203, "Keyboard", "Mechanical keyboard with RGB lighting", 151, 89.99),
    (204, "Monitor Stand", "Adjustable monitor stand for ergonomic setup",
     153, 49.99),
    (205, "Webcam", "HD webcam for video conferencing", 154, 59.99),
    (206, "Headphones",
     "Wireless noise-canceling headphones with premium sound", 151, 199.99),
    (207, "Mouse Pad", "Large gaming mouse pad with wireless charging",
     152, 39.69),
    (208, "Cable Organizer", "Desktop cable organizer for clean setup",
     153, 14.99),
]


@pytest.fixture(scope="module")
def corpus(spark):
    products = spark.createDataFrame(
        PRODUCTS, "id int, name string, description string, "
                  "supplier_id int, price double")
    suppliers = spark.createDataFrame(
        SUPPLIERS, "id int, name string, contact_info string, "
                   "country string, min_order_value double")
    p_idx = build_index(products, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description")],
        numeric_fields=["supplier_id", "price"]))
    s_idx = build_index(suppliers, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="contact_info"),
                     FieldConfig(name="country")],
        numeric_fields=["min_order_value"]))
    return products, suppliers, p_idx, s_idx


def _p_match(corpus, q):
    products, _, p_idx, _ = corpus
    return products.join(compile_query(p_idx, q)
                         .select(F.col("doc_id").alias("mid")),
                         products["id"] == F.col("mid"), "left_semi")


def _s_ids(corpus, q):
    _, _, _, s_idx = corpus
    return compile_query(s_idx, q).select(F.col("doc_id").alias("sid"))


def _joined(corpus, p_df):
    _, suppliers, _, _ = corpus
    return p_df.join(suppliers.select(F.col("id").alias("s_id"),
                                      F.col("name").alias("supplier_name"),
                                      "min_order_value"),
                     F.col("supplier_id") == F.col("s_id"))


def _page(df, n=10):
    return [(r["id"], r["name"], r["supplier_name"])
            for r in df.orderBy("id").limit(n)
            .select("id", "name", "supplier_name").collect()]


def test_1_both_sides_search(corpus):
    p = _p_match(corpus, ast.Parse("wireless", field="description"))
    j = _joined(corpus, p).join(
        _s_ids(corpus, ast.Parse("technology", field="contact_info")),
        F.col("s_id") == F.col("sid"), "left_semi")
    assert _page(j) == [(201, "Wireless Mouse", "TechCorp"),
                        (206, "Headphones", "TechCorp")]


def test_2_side_and_join_level(corpus):
    """side filters + join-level (p.name 'headphones' OR s.name
    'TechCorp') — supplier 151 matches, both candidates pass."""
    p = _p_match(corpus, ast.Parse("wireless", field="description"))
    j = _joined(corpus, p).join(
        _s_ids(corpus, ast.Parse("technology", field="contact_info")),
        F.col("s_id") == F.col("sid"), "left_semi")
    hp = _p_match(corpus, ast.Parse("headphones", field="name")) \
        .select(F.col("id").alias("hid"))
    tc = _s_ids(corpus, ast.Term("name", "techcorp"))
    j = (j.join(hp, F.col("id") == F.col("hid"), "left")
          .join(tc.select(F.col("sid").alias("tcid")),
                F.col("s_id") == F.col("tcid"), "left")
          .filter(F.col("hid").isNotNull() | F.col("tcid").isNotNull()))
    assert _page(j) == [(201, "Wireless Mouse", "TechCorp"),
                        (206, "Headphones", "TechCorp")]


@pytest.mark.parametrize("limit", [None, 10])
def test_3_4_or_across_tables(corpus, limit):
    """OR spanning tables, with and without LIMIT — same 4 rows."""
    products = corpus[0]
    p_w = _p_match(corpus, ast.Parse("wireless", field="description")) \
        .select(F.col("id").alias("pid"))
    s_w = _s_ids(corpus, ast.Parse("wireless", field="contact_info"))
    j = _joined(corpus, products) \
        .join(p_w, F.col("id") == F.col("pid"), "left") \
        .join(s_w, F.col("s_id") == F.col("sid"), "left") \
        .filter(F.col("pid").isNotNull() | F.col("sid").isNotNull())
    want = [(201, "Wireless Mouse", "TechCorp"),
            (203, "Keyboard", "TechCorp"),
            (206, "Headphones", "TechCorp"),
            (207, "Mouse Pad", "GlobalSupply")]
    assert _page(j, limit or 100) == want


def test_5_not_within_or(corpus):
    """(wireless AND NOT mouse) OR s 'shipping' → 202, 206, 207."""
    p = _p_match(corpus, ast.Boolean(
        must=[ast.Parse("wireless", field="description")],
        must_not=[ast.Parse("mouse", field="description")])) \
        .select(F.col("id").alias("pid"))
    s = _s_ids(corpus, ast.Parse("shipping", field="contact_info"))
    j = _joined(corpus, corpus[0]) \
        .join(p, F.col("id") == F.col("pid"), "left") \
        .join(s, F.col("s_id") == F.col("sid"), "left") \
        .filter(F.col("pid").isNotNull() | F.col("sid").isNotNull())
    assert _page(j) == [(202, "USB Cable", "GlobalSupply"),
                        (206, "Headphones", "TechCorp"),
                        (207, "Mouse Pad", "GlobalSupply")]


def test_5b_not_over_or(corpus):
    """NOT (cable OR stand) → six rows."""
    p = _p_match(corpus, ast.Boolean(
        must=[ast.All()],
        must_not=[ast.Boolean(should=[
            ast.Parse("cable", field="description"),
            ast.Parse("stand", field="description")])]))
    j = _joined(corpus, p)
    # 202/208 carry 'cable', 204 carries 'stand' — five rows remain
    assert [r[0] for r in _page(j)] == [201, 203, 205, 206, 207]


def test_6_deeply_nested(corpus):
    """keyboard OR (headphones OR (shipping AND NOT wireless))."""
    kb = _p_match(corpus, ast.Parse("keyboard", field="description")) \
        .select(F.col("id").alias("a1"))
    hp = _p_match(corpus, ast.Parse("headphones", field="description")) \
        .select(F.col("id").alias("a2"))
    not_w = _p_match(corpus, ast.Boolean(
        must=[ast.All()],
        must_not=[ast.Parse("wireless", field="description")])) \
        .select(F.col("id").alias("a3"))
    ship = _s_ids(corpus, ast.Parse("shipping", field="contact_info"))
    j = (_joined(corpus, corpus[0])
         .join(kb, F.col("id") == F.col("a1"), "left")
         .join(hp, F.col("id") == F.col("a2"), "left")
         .join(not_w, F.col("id") == F.col("a3"), "left")
         .join(ship, F.col("s_id") == F.col("sid"), "left")
         .filter(F.col("a1").isNotNull() | F.col("a2").isNotNull()
                 | (F.col("sid").isNotNull() & F.col("a3").isNotNull())))
    assert _page(j) == [(202, "USB Cable", "GlobalSupply"),
                        (203, "Keyboard", "TechCorp"),
                        (206, "Headphones", "TechCorp")]


def test_6b_and_within_or_across(corpus):
    """(wireless AND mouse) OR (shipping AND UK) → 201, 202, 207."""
    pm = _p_match(corpus, ast.Boolean(
        must=[ast.Parse("wireless", field="description"),
              ast.Parse("mouse", field="description")])) \
        .select(F.col("id").alias("pid"))
    su = _s_ids(corpus, ast.Boolean(
        must=[ast.Parse("shipping", field="contact_info"),
              ast.Parse("UK", field="country")]))
    j = _joined(corpus, corpus[0]) \
        .join(pm, F.col("id") == F.col("pid"), "left") \
        .join(su, F.col("s_id") == F.col("sid"), "left") \
        .filter(F.col("pid").isNotNull() | F.col("sid").isNotNull())
    assert [r[0] for r in _page(j)] == [201, 202, 207]


def test_6c_triple_not(corpus):
    """NOT NOT NOT cable ≡ NOT cable → all but 202, 208."""
    inner = ast.Parse("cable", field="description")
    lvl1 = ast.Boolean(must=[ast.All()], must_not=[inner])
    lvl2 = ast.Boolean(must=[ast.All()], must_not=[lvl1])
    lvl3 = ast.Boolean(must=[ast.All()], must_not=[lvl2])
    p = _p_match(corpus, lvl3)
    assert [r[0] for r in _page(_joined(corpus, p))] == \
        [201, 203, 204, 205, 206, 207]


def test_11_multitable_fast_field_predicates(corpus):
    """p.price >= s.min_order_value as a join-level fast-field
    comparison, AND / OR with search arms."""
    p_w = _p_match(corpus, ast.Parse("wireless", field="description"))
    j = _joined(corpus, p_w) \
        .filter(F.col("price") >= F.col("min_order_value"))
    assert [r[0] for r in _page(j)] == [206, 207]

    p_c = _p_match(corpus, ast.Parse("cable", field="description")) \
        .select(F.col("id").alias("pid"))
    j2 = _joined(corpus, corpus[0]) \
        .join(p_c, F.col("id") == F.col("pid"), "left") \
        .filter(F.col("pid").isNotNull()
                | (F.col("price") >= F.col("min_order_value")))
    assert [r[0] for r in _page(j2)] == [202, 203, 204, 206, 207, 208]


def test_12_functions_in_cross_table_predicates(corpus):
    """12a: abs(p.supplier_id - s.id) >= 0 (always true on join rows);
    12b: abs(p.supplier_id) <= length(hex(s.id)) (always false)."""
    p_w = _p_match(corpus, ast.Parse("wireless", field="description"))
    j = _joined(corpus, p_w) \
        .filter(F.abs(F.col("supplier_id") - F.col("s_id")) >= 0)
    assert [r[0] for r in _page(j)] == [201, 206, 207]
    j2 = _joined(corpus, p_w) \
        .filter(F.abs(F.col("supplier_id"))
                <= F.length(F.hex(F.col("s_id"))))
    assert j2.count() == 0
