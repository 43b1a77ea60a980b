"""snippet_position_01_advanced.out golden (PUBLIC reference
behavior): scores and snippets across a JOIN of two independently
indexed tables under boolean combinations of the two search
predicates.  A row's per-side score is 0 and its snippet NULL when
that side didn't match; OR keeps rows where either side matched, AND
requires both; NOT flips a side's match set.  Scores are float32-exact
against the reference output.

Corpus: the reference's authors/books fixture (books' composite key
(id, author_id) becomes a surrogate doc key here).

Ref: pg_search/tests/pg_regress/expected/snippet_position_01_advanced.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

AUTHORS = [(1, "J.K. Rowling", 55), (2, "Stephen King", 75),
           (3, "Agatha Christie", 80), (4, "Dan Brown", 60),
           (5, "J.R.R. Tolkien", 100), (6, "Sami Bowling", 66)]

# the reference's full 2171-char lorem doc — its length sets the
# books corpus avgdl, which every BM25 score below depends on
LOREM = 'test Lorem ipsum dolor sit amet, consectetur adipiscing elit. Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua. Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea commodo consequat. Duis aute irure dolor in reprehenderit in voluptate velit esse cillum dolore eu fugiat nulla pariatur. Excepteur sint occaecat cupidatat non proident, sunt in culpa qui officia deserunt mollit anim id est laborum. Sed ut perspiciatis unde omnis iste natus error sit voluptatem accusantium doloremque laudantium, totam rem aperiam, eaque ipsa quae ab illo inventore veritatis et quasi architecto beatae vitae dicta sunt explicabo. Nemo enim ipsam voluptatem quia voluptas sit aspernatur aut odit aut fugit, sed quia consequuntur magni dolores eos qui ratione voluptatem sequi nesciunt. Neque porro quisquam est, qui dolorem ipsum quia dolor sit amet, consectetur, adipisci velit, sed quia non numquam eius modi tempora incidunt ut labore et dolore magnam aliquam quaerat voluptatem. Ut enim ad minima veniam, quis nostrum exercitationem ullam corporis suscipit laboriosam, nisi ut aliquid ex ea commodi consequatur? Quis autem vel eum iure reprehenderit qui in ea voluptate velit esse quam nihil molestiae consequatur, vel illum qui dolorem eum fugiat quo voluptas nulla pariatur? test At vero eos et accusamus et iusto odio dignissimos ducimus qui blanditiis praesentium voluptatum deleniti atque corrupti quos dolores et quas molestias excepturi sint occaecati cupiditate non provident, similique sunt in culpa qui officia deserunt mollitia animi, id est laborum et dolorum fuga. Et harum quidem rerum facilis est et expedita distinctio. Nam libero tempore, cum soluta nobis est eligendi optio cumque nihil impedit quo minus id quod maxime placeat facere possimus, omnis voluptas assumenda est, omnis dolor repellendus. Temporibus autem quibusdam et aut officiis debitis aut rerum necessitatibus saepe eveniet ut et voluptates repudiandae sint et molestiae non recusandae. Itaque earum rerum hic tenetur a sapiente delectus, ut aut reiciendis voluptatibus maiores alias consequatur aut perferendis doloribus asperiores repellat. test'

BOOKS = [  # (book_id, author_id, content)
    (1, 2, "This is a test test of the snippet function with multiple "
           "test words"),
    (1, 1, "This is a final final of the snippet function with "
           "multiple final words"),
    (1, 6, "This is a final test of the snippet function with "
           "multiple final words"),
    (2, 2, "Another test of the snippet snippet function with repeated "
           "snippet words"),
    (3, 1, "Yet another test test test of the function function "
           "function"),
    (4, 3, LOREM),
]


@pytest.fixture(scope="module")
def fx(spark):
    authors = spark.createDataFrame(AUTHORS,
                                    "id long, name string, age int")
    books = spark.createDataFrame(
        [(bid * 10 + aid, bid, aid, c) for bid, aid, c in BOOKS],
        "bk long, book_id long, author_id long, content string")
    # a bare CREATE INDEX column uses the reference's DEFAULT tokenizer
    # = unicode_words (tokenizers/src/manager.rs Default impl), which is
    # what makes 'J.K.' ONE token (UAX29 MidNumLet) and the scores below
    # float32-exact
    a_idx = build_index(authors, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="unicode_words")]))
    b_idx = build_index(books, IndexSchema(
        key_field="bk",
        text_fields=[FieldConfig(name="content",
                                 tokenizer="unicode_words")]))
    a_scores = compile_query(a_idx, ast.Term("name", "rowling")) \
        .withColumnRenamed("doc_id", "a_id") \
        .withColumnRenamed("score", "author_score")
    b_scores = compile_query(b_idx, ast.Term("content", "test")) \
        .withColumnRenamed("doc_id", "b_bk") \
        .withColumnRenamed("score", "book_score")
    joined = (books.join(authors.withColumnRenamed("id", "aid"),
                         books["author_id"] == F.col("aid"))
              .join(a_scores, F.col("aid") == a_scores["a_id"], "left")
              .join(b_scores, books["bk"] == b_scores["b_bk"], "left")
              .select("book_id", "author_id",
                      F.coalesce("author_score", F.lit(0.0))
                      .alias("author_score"),
                      F.coalesce("book_score", F.lit(0.0))
                      .alias("book_score")))
    return joined


def _rows(df):
    return [(r["book_id"], r["author_id"],
             round(r["author_score"], 6), round(r["book_score"], 6))
            for r in df.orderBy("book_id", "author_id").collect()]


def test_or_matrix(fx):
    # b.content @@@ 'test' OR a.name @@@ 'Rowling' — float32-exact
    got = _rows(fx.filter((F.col("book_score") > 0)
                          | (F.col("author_score") > 0)))
    assert got == [
        (1, 1, round(1.5404451, 6), 0.0),
        (1, 2, 0.0, round(0.45681813, 6)),
        (1, 6, 0.0, round(0.35745716, 6)),
        (2, 2, 0.0, round(0.36441684, 6)),
        (3, 1, round(1.5404451, 6), round(0.4624617, 6)),
        (4, 3, 0.0, round(0.20612015, 6)),
    ]


def test_and_matrix(fx):
    # AND requires both sides: only (3,1)
    got = _rows(fx.filter((F.col("book_score") > 0)
                          & (F.col("author_score") > 0)))
    assert got == [(3, 1, round(1.5404451, 6), round(0.4624617, 6))]


def test_not_combinations(fx):
    # NOT(b) AND a: author matched, book did not -> (1,1)
    got = _rows(fx.filter((F.col("book_score") == 0)
                          & (F.col("author_score") > 0)))
    assert [(r[0], r[1]) for r in got] == [(1, 1)]
    # b AND NOT(a): book matched, author did not
    got = _rows(fx.filter((F.col("book_score") > 0)
                          & (F.col("author_score") == 0)))
    assert [(r[0], r[1]) for r in got] == [(1, 2), (1, 6), (2, 2), (4, 3)]
    # NOT(b) AND NOT(a): neither side
    got = _rows(fx.filter((F.col("book_score") == 0)
                          & (F.col("author_score") == 0)))
    assert [(r[0], r[1]) for r in got] == []


def test_snippet_only_on_matching_side(fx, spark):
    from sparksearch.highlight import with_snippet
    authors = spark.createDataFrame(AUTHORS,
                                    "id long, name string, age int")
    a_idx = build_index(authors, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="unicode_words")]))
    q = ast.Term("name", "rowling")
    hits = compile_query(a_idx, q)
    h = hits.join(authors.withColumnRenamed("id", "doc_id"), "doc_id")
    out = {r["doc_id"]: r["snippet"]
           for r in with_snippet(a_idx, h, q, "name").collect()}
    assert out == {1: "J.K. <b>Rowling</b>"}
    # snippet_positions: char range {{5,12}} over the raw name
    from sparksearch.highlight import with_snippet_positions
    pos = {r["doc_id"]: [[p["start"], p["end"]]
                         for p in r["snippet_positions"]] for r in
           with_snippet_positions(a_idx, h, q, "name").collect()}
    assert pos == {1: [[5, 12]]}
