"""join_scoring.out golden (PUBLIC reference behavior, tables replicated
inline): BM25 scores flowing through JoinScan — score of either join
side projected and sorted on, scores from BOTH sides in one query,
score filters (`score >= 0`, `score > 0`) composed with join and
non-indexed predicates.  All score values are the reference's printed
float32 output, matched here to the last printed digit.

Ref: pg_search/tests/pg_regress/expected/join_scoring.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

from test_join_basic_golden import PRODUCTS, SUPPLIERS  # same corpus

from decimal import Decimal

W_MOUSE = 0.96774966   # product 201, description @@@ 'wireless'
W_OTHER = 0.9080427    # products 206 and 207
S_TECH = 1.2039728     # supplier 151, contact_info @@@ 'technology'


def _f32(x):
    return np.float32(x)


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


def _wireless_scored(shop):
    products, suppliers, p_idx, _ = shop
    m = compile_query(p_idx, ast.Parse("wireless", field="description")) \
        .select("doc_id", "score")
    p = products.join(m, products["id"] == F.col("doc_id")) \
                .drop("doc_id").alias("p")
    return p.join(suppliers.alias("s"),
                  F.col("p.supplier_id") == F.col("s.id"))


def _assert_wireless_rows(got):
    assert [(r["id"], r["name"], r["supplier_name"]) for r in got] == [
        (201, "Wireless Mouse", "TechCorp"),
        (206, "Headphones", "TechCorp"),
        (207, "Mouse Pad", "GlobalSupply")]
    assert [_f32(r["score"]) for r in got] == \
        [_f32(W_MOUSE), _f32(W_OTHER), _f32(W_OTHER)]


def test_order_by_score_desc(shop):
    """TEST 1: ORDER BY paradedb.score(p.id) DESC, p.id."""
    got = (_wireless_scored(shop)
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   "score")
           .orderBy(F.col("score").desc(), F.col("id")).limit(5).collect())
    _assert_wireless_rows(got)


def test_score_projected_order_by_key(shop):
    """TEST 2: score in the target list, ORDER BY p.id."""
    got = (_wireless_scored(shop)
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   "score")
           .orderBy("id").limit(5).collect())
    _assert_wireless_rows(got)


def _both_sides_scored(shop):
    products, suppliers, p_idx, s_idx = shop
    pm = compile_query(p_idx, ast.Parse("wireless", field="description")) \
        .select(F.col("doc_id").alias("pid"),
                F.col("score").alias("product_score"))
    sm = compile_query(s_idx, ast.Parse("technology", field="contact_info")) \
        .select(F.col("doc_id").alias("sid"),
                F.col("score").alias("supplier_score"))
    p = products.join(pm, products["id"] == F.col("pid")).alias("p")
    s = suppliers.join(sm, suppliers["id"] == F.col("sid")).alias("s")
    return p.join(s, F.col("p.supplier_id") == F.col("s.id"))


def test_score_of_other_join_side(shop):
    """TEST 3: paradedb.score(s.id) projected while the driving predicate
    sits on products — supplier score 1.2039728 on both rows."""
    got = (_both_sides_scored(shop)
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   "supplier_score")
           .orderBy("id").limit(10).collect())
    assert [(r["id"], r["name"], r["supplier_name"]) for r in got] == [
        (201, "Wireless Mouse", "TechCorp"),
        (206, "Headphones", "TechCorp")]
    assert [_f32(r["supplier_score"]) for r in got] == [_f32(S_TECH)] * 2


def test_scores_from_both_sides(shop):
    """TEST 4: product AND supplier scores in one select list."""
    got = (_both_sides_scored(shop)
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   "product_score", "supplier_score")
           .orderBy("id").limit(10).collect())
    assert [(r["id"], r["name"], r["supplier_name"],
             _f32(r["product_score"]), _f32(r["supplier_score"]))
            for r in got] == [
        (201, "Wireless Mouse", "TechCorp", _f32(W_MOUSE), _f32(S_TECH)),
        (206, "Headphones", "TechCorp", _f32(W_OTHER), _f32(S_TECH))]


def test_order_by_relevance_alias(shop):
    """TEST 5: ORDER BY the score alias DESC."""
    got = (_both_sides_scored(shop)
           .select("p.id", "p.name",
                   F.col("product_score").alias("relevance"))
           .orderBy(F.col("relevance").desc()).limit(10).collect())
    assert [(r["id"], r["name"], _f32(r["relevance"])) for r in got] == [
        (201, "Wireless Mouse", _f32(W_MOUSE)),
        (206, "Headphones", _f32(W_OTHER))]


def test_score_filter_geq_zero(shop):
    """TEST 6: paradedb.score(p.id) >= 0 keeps every match (ScoreFilter
    lower bound 0 is a no-op on positive BM25 scores)."""
    got = (_wireless_scored(shop)
           .filter(F.col("score") >= 0)
           .select("p.id", "p.name", F.col("s.name").alias("supplier_name"),
                   "score")
           .orderBy("id").limit(10).collect())
    _assert_wireless_rows(got)


def test_build_side_score_with_heap_filter(shop):
    """TEST 7: non-indexed predicate (p.price < 100) + supplier search +
    score(s.id) > 0 — supplier score repeats across joined products."""
    products, suppliers, _, s_idx = shop
    sm = compile_query(s_idx, ast.Parse("technology", field="contact_info")) \
        .select(F.col("doc_id").alias("sid"), "score")
    s = suppliers.join(sm, suppliers["id"] == F.col("sid")).alias("s")
    p = products.filter(F.col("price") < 100).alias("p")
    got = (p.join(s, F.col("p.supplier_id") == F.col("s.id"))
           .filter(F.col("score") > 0)
           .select("p.id", "p.name", F.col("s.id").alias("supplier_id"),
                   F.col("s.name").alias("supplier_name"), "score")
           .orderBy(F.col("score").desc(), F.col("p.id"))
           .limit(10).collect())
    assert [(r["id"], r["name"], r["supplier_id"], r["supplier_name"],
             _f32(r["score"])) for r in got] == [
        (201, "Wireless Mouse", 151, "TechCorp", _f32(S_TECH)),
        (203, "Keyboard", 151, "TechCorp", _f32(S_TECH))]
