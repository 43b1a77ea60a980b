"""snippet_join_predicates.out golden (PUBLIC reference behavior,
tables replicated inline; the reference file is the regression test for
its issue #2553 "snippets get lost when not all predicates push down"):
snippets and snippet_positions stay populated on the author side of a
join even when the author predicate rides a cross-table OR, and the
per-side scores compose must(range const 1.0) + should(term BM25).

Ref: pg_search/tests/pg_regress/expected/snippet_join_predicates.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippet, with_snippet_positions
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

AUTHORS = [
    (1, "J.K. Rowling", 55),
    (2, "Stephen King", 75),
    (3, "Agatha Christie", 80),
    (4, "Dan Brown", 60),
    (5, "J.R.R. Tolkien", 100),
]
BOOKS = [
    (1, 1, "This is a test test of the snippet function with multiple "
     "test words"),
    (2, 2, "Another test of the snippet snippet function with repeated "
     "snippet words"),
    (3, 1, "Yet another test test test of the function function function"),
]

ROWLING = 2.3862944   # must(age>50, const 1.0) + should(name:Rowling)
KING = 1.0            # must arm only
B_SCORES = {1: 0.20342469, 2: 0.13515766, 3: 0.2152619}
B_SNIPS = {
    1: "This is a <b>test</b> <b>test</b> of the snippet function with "
       "multiple <b>test</b> words",
    2: "Another <b>test</b> of the snippet snippet function with "
       "repeated snippet words",
    3: "Yet another <b>test</b> <b>test</b> <b>test</b> of the function "
       "function function",
}
B_POS = {1: [[10, 14], [15, 19], [58, 62]], 2: [[8, 12]],
         3: [[12, 16], [17, 21], [22, 26]]}


def _f32(x):
    return np.float32(x)


@pytest.fixture(scope="module")
def fx(spark):
    authors = spark.createDataFrame(AUTHORS, "id int, name string, age int")
    books = spark.createDataFrame(BOOKS,
                                  "id int, author_id int, content string")
    a_idx = build_index(authors, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    b_idx = build_index(books, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    return authors, books, a_idx, b_idx


def _joined(fx):
    """books ⋈ authors WHERE (b.content @@@ 'test' OR a.name @@@
    'Rowling') AND a.age @@@ '>50', author snippet/positions + scores."""
    authors, books, a_idx, b_idx = fx
    a_q = ast.Boolean(must=[ast.Range("age", lower=50,
                                      lower_inclusive=False)],
                      should=[ast.Parse("Rowling", field="name")])
    am = compile_query(a_idx, a_q) \
        .select(F.col("doc_id").alias("a_k"), F.col("score").alias("a_s"))
    bm = compile_query(b_idx, ast.Parse("test", field="content")) \
        .select(F.col("doc_id").alias("b_k"), F.col("score").alias("b_s"))
    name_arm = compile_query(a_idx, ast.Parse("Rowling", field="name")) \
        .select(F.col("doc_id").alias("n_k"))
    j = (books.alias("b")
         .join(authors.alias("a"),
               F.col("b.author_id") == F.col("a.id"))
         .join(am, F.col("a.id") == F.col("a_k"))        # AND age>50
         .join(bm, F.col("b.id") == F.col("b_k"), "left")
         .join(name_arm, F.col("a.id") == F.col("n_k"), "left")
         .filter(F.col("b_k").isNotNull() | F.col("n_k").isNotNull())
         .select(F.col("b.id").alias("book_id"),
                 F.col("a.name").alias("author_name"),
                 F.col("b.content").alias("content"),
                 F.col("a_s").alias("author_score"),
                 F.coalesce("b_s", F.lit(0.0)).alias("book_score")))
    return j, a_idx, b_idx, a_q


def test_join_or_with_author_snippets(fx):
    """Main repro: author snippets survive the cross-table OR; the
    non-matching author (Stephen King) gets NULL snippet/positions."""
    j, a_idx, b_idx, a_q = _joined(fx)
    j = j.withColumnRenamed("author_name", "name")
    snipped = with_snippet(a_idx, j, ast.Parse("Rowling", field="name"),
                           "name", out_col="author_snippet")
    snipped = with_snippet_positions(
        a_idx, snipped, ast.Parse("Rowling", field="name"), "name",
        out_col="author_positions")
    rows = {r["book_id"]: r for r in snipped.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[1]["author_snippet"] == "J.K. <b>Rowling</b>"
    assert rows[3]["author_snippet"] == "J.K. <b>Rowling</b>"
    assert rows[2]["author_snippet"] is None
    assert [[p["start"], p["end"]] for p in rows[1]["author_positions"]] \
        == [[5, 12]]
    assert rows[2]["author_positions"] is None
    for bid, a_want in [(1, ROWLING), (2, KING), (3, ROWLING)]:
        assert _f32(rows[bid]["author_score"]) == _f32(a_want), bid
        assert _f32(rows[bid]["book_score"]) == _f32(B_SCORES[bid]), bid


def test_single_table_author_pushdown(fx):
    """Comparison case: all predicates on authors push down."""
    authors, _, a_idx, _ = fx
    # the reference prints 1.3862944 = the name term alone: a heap-pushed
    # numeric range rides FastFieldRangeWeight, which scores 0 (unlike
    # the join path's split-predicate must-arm, which contributes 1.0)
    q = ast.Boolean(must=[ast.Parse("Rowling", field="name"),
                          ast.ConstScore(ast.Range("age", lower=50,
                                                   lower_inclusive=False),
                                         0.0)])
    hits = compile_query(a_idx, q)
    h = hits.join(authors.withColumnRenamed("id", "doc_id"), "doc_id")
    h = with_snippet(a_idx, h, q, "name", out_col="author_snippet")
    h = with_snippet_positions(a_idx, h, q, "name",
                               out_col="author_positions")
    rows = h.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 1
    assert r["author_snippet"] == "J.K. <b>Rowling</b>"
    assert [[p["start"], p["end"]] for p in r["author_positions"]] == \
        [[5, 12]]
    assert _f32(r["score"]) == _f32(1.3862944)


def test_single_table_books_snippets(fx):
    """Second comparison case: content @@@ 'test' on books alone."""
    _, books, _, b_idx = fx
    q = ast.Parse("test", field="content")
    hits = compile_query(b_idx, q)
    h = hits.join(books.withColumnRenamed("id", "doc_id"), "doc_id")
    h = with_snippet(b_idx, h, q, "content", out_col="content_snippet")
    h = with_snippet_positions(b_idx, h, q, "content",
                               out_col="content_positions")
    rows = {r["doc_id"]: r for r in h.collect()}
    assert sorted(rows) == [1, 2, 3]
    for bid in (1, 2, 3):
        assert rows[bid]["content_snippet"] == B_SNIPS[bid], bid
        assert [[p["start"], p["end"]]
                for p in rows[bid]["content_positions"]] == B_POS[bid], bid
        assert _f32(rows[bid]["score"]) == _f32(B_SCORES[bid]), bid


def test_left_join_same_rows(fx):
    """LEFT JOIN variant returns the same three rows (all books have
    authors; the age filter strips nothing here)."""
    j, *_ = _joined(fx)
    got = sorted((r["book_id"], r["author_name"],
                  float(_f32(r["author_score"])),
                  float(_f32(r["book_score"]))) for r in j.collect())
    assert got == [
        (1, "J.K. Rowling", float(_f32(ROWLING)),
         float(_f32(B_SCORES[1]))),
        (2, "Stephen King", float(_f32(KING)), float(_f32(B_SCORES[2]))),
        (3, "J.K. Rowling", float(_f32(ROWLING)),
         float(_f32(B_SCORES[3]))),
    ]
