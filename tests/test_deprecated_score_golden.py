"""deprecated_score.out golden (PUBLIC reference behavior): per-side
BM25 scores through joins on the authors/books corpus — the
score_join_predicates corpus under more join shapes.

Sections ported (reference expected values float32-matched):
- single-table twins: name:Rowling AND age>50 → 1.5404451 + range
  const is NOT added when the range is the only other must arm printed
  as 1.5404451 (the reference's direct query scores text-only);
  content:test per-book scores;
- join admitted by ONE side's text arm: a.name 'Rowling' AND
  b.content 'test' → exactly book 3;
- bare cross-table OR (King OR scoring): only King matches — books 1,2
  score (1.5404451, 0);
- duplicate score projections are identical (function+King, age>50);
- LEFT JOIN twin of the split-predicate query returns the INNER result
  (every book has an author);
- score + snippet consistency: snippet renders exactly for rows whose
  OWN side matched ("J.K. <b>Rowling</b>"; empty otherwise).

NOT ported (documented divergence): the `... OR a.age > 60` heap-OR
forms print author_score 1.0 for heap-only rows, contradicting
score_non_indexed_predicates.out's score-0 convention for the same
node shape on one table; this engine follows the latter (0 for
predicate-only matches).  The reference's ERROR 'Unsupported query
shape' rows are capability gaps there, not semantics.

Ref: pg_search/tests/pg_regress/expected/deprecated_score.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippet
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

from test_score_join_golden import AUTHORS, BOOKS

BOOK_SCORES = {"1#2": 0.45681813, "1#1": None, "1#6": 0.35745716,
               "2#2": 0.36441684, "3#1": 0.4624617, "4#3": 0.20612015}


@pytest.fixture(scope="module")
def corpus(spark):
    authors = spark.createDataFrame(AUTHORS, "id int, name string, age int")
    books = spark.createDataFrame(
        BOOKS, "bk string, id int, author_id int, content string")
    a_idx = build_index(authors, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    b_idx = build_index(books, IndexSchema(
        key_field="bk", text_fields=[FieldConfig(name="content")]))
    return authors, books, a_idx, b_idx


def test_direct_author_query(corpus):
    """WHERE a.name @@@ 'Rowling' AND a.age @@@ '>50' → the text arm's
    BM25 is the reference's printed 1.5404451.

    Documented divergence in the CONSTANT only: the reference's
    single-table scan compiles a numeric ``@@@`` range to its
    fast-field range weight, which scores 0 (so it prints bare
    1.5404451), while its join build-side scores the same range const
    1.0 (score_join_predicates.out prints 1 + 1.5404451 = 2.540445 for
    the identical corpus).  This engine scores ranges const 1.0
    UNIFORMLY — one convention everywhere — so the total here is
    2.5404451 and the text component matches the reference exactly."""
    _, _, a_idx, _ = corpus
    q = ast.Boolean(must=[ast.Term("name", "rowling"),
                          ast.Range("age", lower=50, lower_inclusive=False)])
    rows = compile_query(a_idx, q).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1
    assert rows[0]["score"] - 1.0 == pytest.approx(1.5404451, abs=2e-6)


def test_direct_books_query(corpus):
    _, _, _, b_idx = corpus
    got = {r["doc_id"]: r["score"] for r in
           compile_query(b_idx, ast.Term("content", "test")).collect()}
    want = {bk: s for bk, s in BOOK_SCORES.items() if s is not None}
    assert set(got) == set(want)
    for bk, s in want.items():
        assert got[bk] == pytest.approx(s, abs=2e-6), bk


def test_join_both_sides_text(corpus):
    """a.name 'Rowling' AND b.content 'test' through the join → one
    row: book 3, scores (1.5404451, 0.4624617)."""
    authors, books, a_idx, b_idx = corpus
    a_s = compile_query(a_idx, ast.Term("name", "rowling")).select(
        F.col("doc_id").alias("aid"), F.col("score").alias("a_score"))
    b_s = compile_query(b_idx, ast.Term("content", "test")).select(
        F.col("doc_id").alias("bbk"), F.col("score").alias("b_score"))
    j = (books.join(a_s, books["author_id"] == F.col("aid"))
              .join(b_s, books["bk"] == F.col("bbk"))
              .select("id", "a_score", "b_score").collect())
    assert len(j) == 1
    assert j[0]["id"] == 3
    assert j[0]["a_score"] == pytest.approx(1.5404451, abs=2e-6)
    assert j[0]["b_score"] == pytest.approx(0.4624617, abs=2e-6)


def _king_or_scoring(corpus, join_type):
    """(a.name @@@ 'King' OR b.content @@@ 'scoring') via the two-index
    OR join: union of rows admitted by either side's arm."""
    authors, books, a_idx, b_idx = corpus
    a_s = compile_query(a_idx, ast.Term("name", "king")).select(
        F.col("doc_id").alias("aid"), F.col("score").alias("a_score"))
    b_s = compile_query(b_idx, ast.Term("content", "scoring")).select(
        F.col("doc_id").alias("bbk"), F.col("score").alias("b_score"))
    j = (books.join(authors.select(F.col("id").alias("a_id"),
                                   F.col("name").alias("author_name")),
                    books["author_id"] == F.col("a_id"), join_type)
              .join(a_s, F.col("author_id") == F.col("aid"), "left")
              .join(b_s, books["bk"] == F.col("bbk"), "left")
              .filter(F.col("aid").isNotNull() | F.col("bbk").isNotNull())
              .select(books["id"].alias("book_id"), "author_name",
                      F.coalesce("a_score", F.lit(0.0)).alias("author_score"),
                      F.coalesce("b_score", F.lit(0.0)).alias("book_score"))
              .orderBy("book_id", "author_name"))
    return j.collect()


@pytest.mark.parametrize("join_type", ["inner", "left", "right"])
def test_king_or_scoring_all_join_types(corpus, join_type):
    """'scoring' matches no book; King matches author 2 (books 1, 2) —
    the golden prints the identical two rows for JOIN / LEFT JOIN /
    RIGHT JOIN."""
    rows = _king_or_scoring(corpus, join_type)
    assert [(r["book_id"], r["author_name"]) for r in rows] == \
        [(1, "Stephen King"), (2, "Stephen King")]
    for r in rows:
        assert r["author_score"] == pytest.approx(1.5404451, abs=2e-6)
        assert r["book_score"] == 0.0


def test_duplicate_score_projections_identical(corpus):
    """paradedb.score(x) twice in one SELECT → identical values
    (the golden's multi-score-call consistency section)."""
    authors, books, a_idx, b_idx = corpus
    a_q = ast.Boolean(must=[ast.Range("age", lower=50,
                                      lower_inclusive=False)],
                      should=[ast.Term("name", "king")])
    a_s = compile_query(a_idx, a_q).select(
        F.col("doc_id").alias("aid"),
        F.col("score").alias("s1"), F.col("score").alias("s2"))
    b_s = compile_query(b_idx, ast.Term("content", "function")).select(
        F.col("doc_id").alias("bbk"),
        F.col("score").alias("b1"), F.col("score").alias("b2"))
    j = (books.join(a_s, books["author_id"] == F.col("aid"))
              .join(b_s, books["bk"] == F.col("bbk"))
              .select("id", "author_id", "s1", "s2", "b1", "b2")
              .orderBy("id", "author_id").collect())
    # golden rows: books 1 (authors 1,2,6), 2, 3 — book 4 (LOREM) has
    # no 'function'
    assert [(r["id"], r["author_id"]) for r in j] == \
        [(1, 1), (1, 2), (1, 6), (2, 2), (3, 1)]
    for r in j:
        assert r["s1"] == r["s2"]
        assert r["b1"] == r["b2"]
    # King rows carry 1 (range) + 1.5404451 = the golden's 2.540445
    king = {r["id"]: r["s1"] for r in j if r["author_id"] == 2}
    assert king[1] == pytest.approx(2.540445, abs=2e-6)
    # every book-1 row scores 'function' identically (0.35745716): the
    # three book-1 contents each contain it once at the same length
    b1 = {r["author_id"]: r["b1"] for r in j if r["id"] == 1}
    for v in b1.values():
        assert v == pytest.approx(0.35745716, abs=2e-6)


def test_score_and_snippet_consistent(corpus):
    """Rows whose a-side matched render the name snippet
    ('J.K. <b>Rowling</b>'); rows admitted only via the b-side render
    an empty author snippet — the golden's final section."""
    authors, books, a_idx, b_idx = corpus
    from sparksearch.query.search import search
    q = ast.Term("name", "rowling")
    hits = search(a_idx, q, limit=10, columns=["id", "name"])
    a_sn = with_snippet(a_idx, hits, q, "name")
    got = {r["id"]: r["snippet"] for r in a_sn.collect()}
    assert got == {1: "J.K. <b>Rowling</b>"}
