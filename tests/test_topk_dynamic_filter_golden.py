"""topk_dynamic_filter.out golden (PUBLIC reference behavior, tables
replicated inline): ORDER BY + LIMIT joins whose row sets the reference
prunes with HashJoin min/max and TopK-threshold dynamic filters —
search on the probe side, search on the build side, both sides,
numeric-sort TopK, semi-joins (IN subquery), and the benchmark-style
TEXT-key semi-join with wide vs narrow build-side ranges.  Spark's
TakeOrderedAndProject + broadcast-join plans produce the same row sets;
runtime pruning is AQE/bloom-filter territory, so rows are the pin.

Ref: pg_search/tests/pg_regress/expected/topk_dynamic_filter.out
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

SUPPLIERS = [
    (1, "AlphaSupply", "north america domestic shipping"),
    (2, "BetaGoods", "europe international logistics"),
    (3, "GammaParts", "asia pacific global trade"),
    (4, "DeltaCorp", "south america regional distribution"),
    (5, "EpsilonTech", "africa emerging market wireless"),
]


@pytest.fixture(scope="module")
def shop(spark):
    suppliers = spark.createDataFrame(SUPPLIERS,
                                      "id int, name string, region string")
    products = spark.createDataFrame(
        [(i, f"Product {i}",
          f"premium quality item number {i} for professional use",
          (i % 5) + 1, Decimal(str(round(10.0 + i * 9.8, 2))))
         for i in range(1, 31)],
        "id int, name string, description string, supplier_id int, "
        "price decimal(10,2)")
    p_idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    s_idx = build_index(suppliers, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="region")]))
    return products, suppliers, p_idx, s_idx


def _m(idx, q):
    return compile_query(idx, q).select("doc_id")


def test_1_probe_side_search_topk(shop):
    products, suppliers, p_idx, _ = shop
    m = _m(p_idx, ast.Parse("premium", field="description"))
    p = products.join(m, products["id"] == m["doc_id"]).alias("p")
    got = (p.join(suppliers.alias("s"),
                  F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(3).collect())
    assert [tuple(r) for r in got] == [
        (1, "Product 1", "BetaGoods"),
        (2, "Product 2", "GammaParts"),
        (3, "Product 3", "DeltaCorp")]


def test_2_build_side_search_prunes_probe(shop):
    products, suppliers, _, s_idx = shop
    m = _m(s_idx, ast.Parse("wireless", field="region"))
    s = suppliers.join(m, suppliers["id"] == m["doc_id"]).alias("s")
    got = (products.alias("p")
           .join(s, F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(3).collect())
    assert [tuple(r) for r in got] == [
        (4, "Product 4", "EpsilonTech"),
        (9, "Product 9", "EpsilonTech"),
        (14, "Product 14", "EpsilonTech")]


def test_3_order_by_desc(shop):
    products, suppliers, p_idx, _ = shop
    m = _m(p_idx, ast.Parse("premium", field="description"))
    p = products.join(m, products["id"] == m["doc_id"]).alias("p")
    got = (p.join(suppliers.alias("s"),
                  F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy(F.col("id").desc()).limit(2).collect())
    assert [tuple(r) for r in got] == [
        (30, "Product 30", "AlphaSupply"),
        (29, "Product 29", "EpsilonTech")]


def test_4_numeric_sort_column(shop):
    products, suppliers, p_idx, _ = shop
    m = _m(p_idx, ast.Parse("premium", field="description"))
    p = products.join(m, products["id"] == m["doc_id"]).alias("p")
    got = (p.join(suppliers.alias("s"),
                  F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id", "p.name", "p.price",
                   F.col("s.name").alias("supplier_name"))
           .orderBy(F.col("price").asc()).limit(2).collect())
    assert [(r["id"], r["name"], r["price"], r["supplier_name"])
            for r in got] == [
        (1, "Product 1", Decimal("19.80"), "BetaGoods"),
        (2, "Product 2", Decimal("29.60"), "GammaParts")]


def test_5_search_both_sides(shop):
    products, suppliers, p_idx, s_idx = shop
    pm = _m(p_idx, ast.Parse("premium", field="description"))
    sm = _m(s_idx, ast.Parse("global", field="region")) \
        .withColumnRenamed("doc_id", "sid")
    p = products.join(pm, products["id"] == pm["doc_id"]).alias("p")
    s = suppliers.join(sm, suppliers["id"] == F.col("sid")).alias("s")
    got = (p.join(s, F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"))
           .orderBy("id").limit(5).collect())
    assert [tuple(r) for r in got] == [
        (2, "Product 2", "GammaParts"),
        (7, "Product 7", "GammaParts"),
        (12, "Product 12", "GammaParts"),
        (17, "Product 17", "GammaParts"),
        (22, "Product 22", "GammaParts")]


def test_6_semi_join_in_subquery(shop):
    products, suppliers, _, s_idx = shop
    m = _m(s_idx, ast.Parse("wireless", field="region"))
    keys = suppliers.join(m, suppliers["id"] == m["doc_id"]) \
                    .select(F.col("id").alias("sid"))
    got = (products.join(keys, products["supplier_id"] == F.col("sid"),
                         "left_semi")
           .select("id", "name", "price")
           .orderBy("id").limit(3).collect())
    assert [(r["id"], r["name"], r["price"]) for r in got] == [
        (4, "Product 4", Decimal("49.20")),
        (9, "Product 9", Decimal("98.20")),
        (14, "Product 14", Decimal("147.20"))]


def test_7_no_limit_same_rows(shop):
    products, suppliers, p_idx, _ = shop
    m = _m(p_idx, ast.Parse("premium", field="description"))
    p = products.join(m, products["id"] == m["doc_id"]).alias("p")
    got = (p.join(suppliers.alias("s"),
                  F.col("p.supplier_id") == F.col("s.id"))
           .select("p.id").orderBy("id").collect())
    assert [r["id"] for r in got] == list(range(1, 31))


# --- TEST 8: benchmark-style TEXT-key semi-join ------------------------------

CATS = ["PROJECT_ALPHA review notes", "BETA_GROUP project overview",
        "GAMMA_DIVISION quarterly report", "PROJECT_ALPHA design spec",
        "BETA_GROUP budget analysis", "GAMMA_DIVISION team roster",
        "PROJECT_ALPHA roadmap planning", "BETA_GROUP status update",
        "GAMMA_DIVISION risk assessment", "PROJECT_ALPHA launch checklist",
        "BETA_GROUP marketing strategy", "GAMMA_DIVISION vendor evaluation",
        "PROJECT_ALPHA feedback summary", "BETA_GROUP compliance report",
        "GAMMA_DIVISION hiring plan", "PROJECT_ALPHA milestone tracker",
        "BETA_GROUP onboarding guide", "GAMMA_DIVISION security audit",
        "PROJECT_ALPHA resource allocation", "BETA_GROUP incident response"]
TITLE_WORD = ["intro", "overview", "quarterly", "design", "budget",
              "roster", "roadmap", "status", "risk", "launch", "marketing",
              "vendor", "feedback", "compliance", "hiring", "milestone",
              "onboarding", "security", "resource", "incident"]


@pytest.fixture(scope="module")
def bench(spark):
    documents = spark.createDataFrame(
        [(f"doc-{i + 1:02d}", CATS[i],
          f"Document Title {i + 1} - {TITLE_WORD[i]}")
         for i in range(20)],
        "id string, category string, title string")
    files = spark.createDataFrame(
        [(i, f"doc-{(i - 1) % 20 + 1:02d}", f"File Title {i:03d}")
         for i in range(1, 201)],
        "id int, document_id string, title string")
    d_idx = build_index(documents, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="category"),
                                     FieldConfig(name="title")]))
    return documents, files, d_idx


def test_8a_wide_range_build_side(bench):
    """'PROJECT_ALPHA' (one UAX29 token — '_' is ExtendNumLet) matches
    7 scattered docs; matching files sorted by title."""
    documents, files, d_idx = bench
    m = _m(d_idx, ast.Parse("PROJECT_ALPHA", field="category"))
    keys = documents.join(m, documents["id"] == m["doc_id"]) \
                    .select(F.col("id").alias("did"))
    got = (files.join(keys, files["document_id"] == F.col("did"),
                      "left_semi")
           .select("id", "title").orderBy("title").limit(3).collect())
    assert [(r["id"], r["title"]) for r in got] == [
        (1, "File Title 001"), (4, "File Title 004"),
        (7, "File Title 007")]


def test_8b_narrow_range_build_side(bench):
    """'intro' matches only doc-01; files 1, 21, 41 reference it."""
    documents, files, d_idx = bench
    m = _m(d_idx, ast.Parse("intro", field="title"))
    keys = documents.join(m, documents["id"] == m["doc_id"]) \
                    .select(F.col("id").alias("did"))
    got = (files.join(keys, files["document_id"] == F.col("did"),
                      "left_semi")
           .select("id", "title").orderBy("title").limit(3).collect())
    assert [(r["id"], r["title"]) for r in got] == [
        (1, "File Title 001"), (21, "File Title 021"),
        (41, "File Title 041")]
