"""score_non_indexed_predicates.out golden (PUBLIC reference behavior):
BM25 scores when indexed text queries compose with NON-indexed column
predicates.  Float32 score values are the reference's printed output
over its 11-row products table:

- multi-field should-OR sums per-field BM25 (iPhone = name 'apple' +
  description 'smartphone');
- AND a non-indexed predicate filters rows but never changes scores;
- OR a non-indexed predicate (HeapOr) unions the match sets and
  predicate-only rows carry score 0.
"""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, "Apple iPhone 14", "Latest Apple smartphone with great camera",
     "Casual"),
    (2, "MacBook Pro", "Powerful Apple laptop for professionals",
     "Electronics"),
    (3, "Nike Air Max", "Comfortable running shoes for athletes",
     "Footwear"),
    (4, "Samsung Galaxy", "Android smartphone with excellent display",
     "Electronics"),
    (5, "Adidas Ultraboost", "Premium running shoes with boost technology",
     "Footwear"),
    (6, "Nike Normal",
     "Comfortable running shoes for athletes and technology enthusiasts",
     "Footwear"),
    (7, "Apple Watch", "Smartwatch with health tracking features",
     "Electronics"),
    (8, "Sony Headphones", "Noise-canceling headphones for music lovers",
     "Electronics"),
    (9, "Running Socks", "Moisture-wicking socks for athletes", "Footwear"),
    (10, "Budget Phone", "Affordable smartphone for basic needs",
     "Electronics"),
    (11, "Budget Tablet", "Affordable tablet for basic needs", "Garbage"),
]

# reference printed float32 scores
TEXT_OR = {1: 2.5521502, 7: 1.6239789, 4: 1.2838018, 10: 1.2838018}


@pytest.fixture(scope="module")
def products_index(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, name string, description string, category_name string")
    # the BM25 index covers only (name, description) — category_name is
    # deliberately NOT indexed, like the reference's products_bm25_idx
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description")]))


def _q_text():
    return ast.Boolean(should=[ast.Term("name", "apple"),
                               ast.Term("description", "smartphone")])


def test_multi_field_or_scores_golden(products_index):
    """name @@@ 'Apple' OR description @@@ 'smartphone' → 4 rows, scores
    sum per-field BM25, float32-exact."""
    got = {r["doc_id"]: r["score"] for r in
           compile_query(products_index, _q_text()).collect()}
    assert set(got) == set(TEXT_OR)
    for i, want in TEXT_OR.items():
        assert got[i] == pytest.approx(want, abs=2e-6), i


def test_and_non_indexed_predicate_keeps_scores_golden(products_index):
    """(text) AND category_name = 'Electronics' → rows filtered, scores
    UNCHANGED (7, 4, 10)."""
    q = ast.HeapFilter(_q_text(), "category_name = 'Electronics'")
    got = {r["doc_id"]: r["score"] for r in
           compile_query(products_index, q).collect()}
    assert set(got) == {7, 4, 10}
    for i in (7, 4, 10):
        assert got[i] == pytest.approx(TEXT_OR[i], abs=2e-6), i


def test_or_non_indexed_predicate_scores_zero_golden(products_index):
    """(text) OR category_name = 'Electronics' → union; MacBook Pro and
    Sony Headphones match only the predicate and carry score 0."""
    q = ast.HeapOr(_q_text(), "category_name = 'Electronics'")
    got = {r["doc_id"]: r["score"] for r in
           compile_query(products_index, q).collect()}
    assert set(got) == {1, 7, 4, 10, 2, 8}
    for i, want in TEXT_OR.items():
        assert got[i] == pytest.approx(want, abs=2e-6), i
    assert got[2] == 0.0 and got[8] == 0.0
    # ORDER BY score DESC matches the golden's row order
    order = [i for i, _ in sorted(got.items(),
                                  key=lambda kv: (-kv[1], kv[0]))]
    assert order[:4] == [1, 7, 4, 10] and set(order[4:]) == {2, 8}


def test_partial_index_scores_golden(spark):
    """partial_index_score_fix.out: BM25 stats over the PARTIAL corpus —
    a partial index (WHERE category='Electronics', 3 rows) gives
    score = idf = ln(1.6) = 0.47000363 for 'apple' (df=2 of N=3, every
    doc 2 tokens so the length term cancels); heap-filtering rating >= 4
    keeps the same scores; paradedb.all() over the partial index sees
    only the partial corpus."""
    rows = [(1, "Apple iPhone", "Electronics", 5),
            (2, "Samsung Galaxy", "Electronics", 4),
            (3, "Nike Shoes", "Footwear", 3),
            (4, "Apple Watch", "Electronics", 4),
            (5, "Apple Box", "Footwear", 4),
            (6, "Adidas Sneakers", "Footwear", 2)]
    docs = spark.createDataFrame(
        rows, "id int, description string, category string, rating int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")],
        predicate="category = 'Electronics'"))
    got = {r["doc_id"]: r["score"] for r in
           compile_query(idx, ast.Term("description", "apple")).collect()}
    assert set(got) == {1, 4}
    for i in (1, 4):
        assert got[i] == pytest.approx(0.47000363, abs=2e-6)
    # + rating >= 4 heap filter: same rows, same scores
    got2 = {r["doc_id"]: r["score"] for r in compile_query(
        idx, ast.HeapFilter(ast.Term("description", "apple"),
                            "rating >= 4")).collect()}
    assert got2 == pytest.approx(got)
    # paradedb.all() + heap filter over the partial corpus
    got3 = sorted(r["doc_id"] for r in compile_query(
        idx, ast.HeapFilter(ast.All(), "rating >= 4")).collect())
    assert got3 == [1, 2, 4]
