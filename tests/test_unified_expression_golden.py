"""unified_expression_comprehensive.out golden (PUBLIC reference
behavior, table replicated inline): BM25 scores through heap-filtered
(non-indexed) predicates — AND/OR mixes of search and plain predicates,
NULL / NOT NULL / array / timestamp / LIKE heap filters, empty results,
keyset-style subquery cursors with ILIKE ANY.  Scores are the
reference's printed float32 values; note the reference's heap_filter
compilation makes EACH top-level ANDed non-indexed predicate its own
must clause that re-scores the indexed query, so a row's score is
N_heap_clauses × base (BETWEEN counts as two) — modeled here with one
ast.HeapFilter must-arm per predicate.

Ref: pg_search/tests/pg_regress/expected/unified_expression_comprehensive.out
"""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

TS = dt.datetime(2025, 1, 1, 12, 0)
PRODUCTS = [
    (1, "Apple iPhone 14", "Latest Apple smartphone with great camera",
     999.99, 1, "Casual", True, 4.5, ["smartphone", "apple"]),
    (2, "MacBook Pro", "Powerful Apple laptop for professionals",
     2499.99, 1, "Electronics", True, 4.8, ["laptop", "apple"]),
    (3, "Nike Air Max", "Comfortable running shoes for athletes",
     149.99, 2, "Footwear", True, 4.2, ["shoes", "running"]),
    (4, "Samsung Galaxy", "Android smartphone with excellent display",
     899.99, 1, "Electronics", False, 4.3, ["smartphone", "android"]),
    (5, "Adidas Ultraboost",
     "Premium running shoes with boost technology",
     179.99, 2, "Footwear", True, 4.6, ["shoes", "running", "premium"]),
    (6, "Nike Normal",
     "Comfortable running shoes for athletes and technology enthusiasts",
     149.99, 2, "Footwear", False, 3.9, ["shoes", "casual"]),
    (7, "Apple Watch", "Smartwatch with health tracking features",
     399.99, 1, "Electronics", True, 4.4, ["watch", "apple"]),
    (8, "Sony Headphones", "Noise-canceling headphones for music lovers",
     299.99, 1, "Electronics", True, 4.7, ["headphones", "audio"]),
    (9, "Running Socks", "Moisture-wicking socks for athletes",
     19.99, 2, "Footwear", True, 4.0, ["socks", "running"]),
    (10, "Budget Phone", "Affordable smartphone for basic needs",
     199.99, 1, "Electronics", False, 3.5, None),
    (11, "Budget Tablet", "Affordable tablet for basic needs",
     199.99, 1, "Garbage", False, 3.5, None),
]


def _f32(x):
    return np.float32(x)


@pytest.fixture(scope="module")
def fx(spark):
    docs = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], r[5], r[6], TS, r[7], r[8])
         for r in PRODUCTS],
        "id int, name string, description string, price double, "
        "category_id int, category_name string, in_stock boolean, "
        "created_at timestamp, rating float, tags array<string>")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))
    return docs, idx


APPLE_OR_PHONE = ast.Boolean(should=[
    ast.Parse("Apple", field="name"),
    ast.Parse("smartphone", field="description")])


def _rows(idx, q, order_cols=("id",)):
    df = compile_query(idx, q)
    return df


def _scored(fx, q, heap_preds=()):
    """Compile q with one HeapFilter must-arm per heap predicate (the
    reference's field_filters shape) and join display columns."""
    docs, idx = fx
    node = q
    if heap_preds:
        node = ast.Boolean(must=[ast.HeapFilter(q, p)
                                 for p in heap_preds])
    m = compile_query(idx, node)
    return docs.join(m, docs["id"] == m["doc_id"]).drop("doc_id")


def _want(df, want):
    got = [(r["id"], float(_f32(r["score"]))) for r in
           df.select("id", "score")
           .orderBy(F.col("score").desc(), F.col("id")).collect()]
    assert got == [(i, float(_f32(s))) for i, s in want]


def test_1_indexed_only_scores(fx):
    _want(_scored(fx, APPLE_OR_PHONE),
          [(1, 2.5521502), (7, 1.6239789), (4, 1.2838018),
           (10, 1.2838018)])


def test_2_and_non_indexed_single_filter(fx):
    _want(_scored(fx, APPLE_OR_PHONE,
                  ["category_name = 'Electronics'"]),
          [(7, 1.6239789), (4, 1.2838018), (10, 1.2838018)])


def test_2b_or_non_indexed_zero_scored(fx):
    """search OR heap predicate: heap-only rows score 0."""
    docs, idx = fx
    m = compile_query(idx, APPLE_OR_PHONE) \
        .select(F.col("doc_id").alias("k"), "score")
    j = (docs.join(m, docs["id"] == F.col("k"), "left")
         .filter(F.col("k").isNotNull()
                 | (F.col("category_name") == "Electronics"))
         .select("id", F.coalesce("score", F.lit(0.0)).alias("score")))
    _want(j, [(1, 2.5521502), (7, 1.6239789), (4, 1.2838018),
              (10, 1.2838018), (2, 0.0), (8, 0.0)])


def test_2c_and_pair_or_non_indexed(fx):
    """(name AND description) OR heap predicate."""
    docs, idx = fx
    both = ast.Boolean(must=[ast.Parse("Apple", field="name"),
                             ast.Parse("smartphone",
                                       field="description")])
    m = compile_query(idx, both) \
        .select(F.col("doc_id").alias("k"), "score")
    j = (docs.join(m, docs["id"] == F.col("k"), "left")
         .filter(F.col("k").isNotNull()
                 | (F.col("category_name") == "Electronics"))
         .select("id", F.coalesce("score", F.lit(0.0)).alias("score")))
    _want(j, [(1, 2.5521502), (2, 0.0), (4, 0.0), (7, 0.0), (8, 0.0),
              (10, 0.0)])


def test_3_price_filter(fx):
    _want(_scored(fx, ast.Parse("running", field="description"),
                  ["price < 200.00"]),
          [(3, 1.2838018), (5, 1.1921678), (6, 1.0432408)])


def test_4_three_heap_clauses_triple_score(fx):
    """category + BETWEEN (= two comparisons) = 3 heap clauses, each
    re-scoring the indexed OR — 3 × base."""
    _want(_scored(fx, ast.Boolean(should=[
        ast.Parse("shoes", field="name"),
        ast.Parse("running", field="description")]),
        ["category_name = 'Footwear'", "price >= 100.00",
         "price <= 200.00"]),
        [(3, 3.8514054), (5, 3.5765033), (6, 3.1297224)])


def test_5_three_filters_on_single_term(fx):
    _want(_scored(fx, ast.Parse("Apple", field="description"),
                  ["category_id = 1", "price > 500.00",
                   "category_name = 'Electronics'"]),
          [(2, 4.903143)])


def test_6_nested_or_heap_single_clause(fx):
    _want(_scored(fx, ast.Parse("smartphone", field="description"),
                  ["(price < 500.00 AND in_stock) OR "
                   "(price > 800.00 AND category_name = 'Electronics')"]),
          [(4, 1.2838018)])


def test_8_real_comparison(fx):
    _want(_scored(fx, ast.Parse("running", field="description"),
                  ["rating >= 4.0"]),
          [(3, 1.2838018), (5, 1.1921678)])


def test_9_null_checks(fx):
    _want(_scored(fx, ast.Parse("phone", field="name"),
                  ["tags IS NULL"]),
          [(10, 2.1528337)])
    # OR form: heap-only row scores 0
    docs, idx = fx
    m = compile_query(idx, ast.Parse("phone", field="name")) \
        .select(F.col("doc_id").alias("k"), "score")
    j = (docs.join(m, docs["id"] == F.col("k"), "left")
         .filter(F.col("k").isNotNull() | F.col("tags").isNull())
         .select("id", F.coalesce("score", F.lit(0.0)).alias("score")))
    _want(j, [(10, 2.1528337), (11, 0.0)])


def test_10_not_null(fx):
    _want(_scored(fx, ast.Parse("Apple", field="description"),
                  ["tags IS NOT NULL"]),
          [(2, 1.6343809), (1, 1.5177236)])


def test_11_multi_or_heap(fx):
    _want(_scored(fx, ast.Parse("technology", field="description"),
                  ["price < 100.00 OR category_name = 'Electronics' "
                   "OR in_stock = false"]),
          [(6, 1.3281277)])


def test_12_all_filtered_out(fx):
    assert _scored(fx, ast.Parse("running", field="description"),
                   ["price > 1000.00"]).count() == 0


def test_14_array_any(fx):
    _want(_scored(fx, ast.Parse("Apple", field="description"),
                  ["array_contains(tags, 'apple')"]),
          [(2, 1.6343809), (1, 1.5177236)])


def test_15_timestamp_filter(fx):
    _want(_scored(fx, ast.Parse("Apple", field="name"),
                  ["created_at > timestamp'2024-01-01 00:00:00'"]),
          [(7, 1.6239789), (1, 1.3599824)])


def test_16_mixed_types_three_filters(fx):
    _want(_scored(fx, ast.Parse("shoes", field="description"),
                  ["price <= 200.00", "rating > 4.0",
                   "category_id = 2"]),
          [(3, 3.8514054), (5, 3.5765033)])


def test_17_like_no_match(fx):
    assert _scored(fx, ast.Parse("technology", field="description"),
                   ["category_name LIKE 'Elect%'"]).count() == 0


def test_18_complex_real_world(fx):
    _want(_scored(fx, APPLE_OR_PHONE,
                  ["(price > 500.00 AND in_stock) OR "
                   "(price < 300.00 AND rating >= 4.0) OR "
                   "(category_name = 'Electronics' AND rating > 4.5)"]),
          [(1, 2.5521502)])


def _keyset(fx, patterns, anchor_id):
    """ILIKE ANY + (created_at < anchor OR (id < anchor AND created_at
    = anchor)) keyset cursor, ordered DESC."""
    docs, idx = fx
    m = compile_query(idx, ast.All()).select("doc_id")
    base = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
    like = None
    for p in patterns:
        c = F.lower(F.col("name")).like(p.lower())
        like = c if like is None else (like | c)
    anchor = docs.filter(F.col("id") == anchor_id) \
        .select(F.col("created_at").alias("a_ts"))
    j = (base.filter(like).crossJoin(anchor)
         if anchor.count() else base.filter(like)
         .withColumn("a_ts", F.lit(None).cast("timestamp")))
    out = (j.filter((F.col("created_at") < F.col("a_ts"))
                    | ((F.col("id") < anchor_id)
                       & (F.col("created_at") == F.col("a_ts"))))
           .orderBy(F.col("created_at").desc(), F.col("id").desc())
           .limit(100))
    return [r["id"] for r in out.select("id").collect()]


def test_keyset_cursor_missing_anchor(fx):
    assert _keyset(fx, ["%Socks%"], 1978) == []


def test_keyset_cursor_same_ts_anchor(fx):
    assert _keyset(fx, ["%Socks%"], 7) == []
    assert _keyset(fx, ["%Nike%", "%Adidas%"], 8) == [6, 5, 3]
    assert _keyset(fx, ["%Apple%", "%Samsung%"], 8) == [7, 4, 1]
