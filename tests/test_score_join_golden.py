"""score_join_predicates.out golden (PUBLIC reference behavior):
per-side BM25 scores through a two-index scored join where the search
predicates split across tables —

    (b.content @@@ 'test' OR a.name @@@ 'Rowling') AND a.age @@@ '>50'

The a-side compiles to must(range age>50) + should(name:Rowling): range
matches score the constant 1.0, Rowling adds BM25 on top (2.540445
float32-exact).  The b-side scores content:'test' alone; rows admitted
only via the a-side carry book_score 0.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

AUTHORS = [(1, "J.K. Rowling", 55), (2, "Stephen King", 75),
           (3, "Agatha Christie", 80), (4, "Dan Brown", 60),
           (5, "J.R.R. Tolkien", 100), (6, "Sami Bowling", 66)]

LOREM = ("test Lorem ipsum dolor sit amet, consectetur adipiscing elit. "
         "Sed do eiusmod tempor incididunt ut labore et dolore magna "
         "aliqua. Ut enim ad minim veniam, quis nostrud exercitation "
         "ullamco laboris nisi ut aliquip ex ea commodo consequat. Duis "
         "aute irure dolor in reprehenderit in voluptate velit esse "
         "cillum dolore eu fugiat nulla pariatur. Excepteur sint "
         "occaecat cupidatat non proident, sunt in culpa qui officia "
         "deserunt mollit anim id est laborum. Sed ut perspiciatis unde "
         "omnis iste natus error sit voluptatem accusantium doloremque "
         "laudantium, totam rem aperiam, eaque ipsa quae ab illo "
         "inventore veritatis et quasi architecto beatae vitae dicta "
         "sunt explicabo. Nemo enim ipsam voluptatem quia voluptas sit "
         "aspernatur aut odit aut fugit, sed quia consequuntur magni "
         "dolores eos qui ratione voluptatem sequi nesciunt. Neque porro "
         "quisquam est, qui dolorem ipsum quia dolor sit amet, "
         "consectetur, adipisci velit, sed quia non numquam eius modi "
         "tempora incidunt ut labore et dolore magnam aliquam quaerat "
         "voluptatem. Ut enim ad minima veniam, quis nostrum "
         "exercitationem ullam corporis suscipit laboriosam, nisi ut "
         "aliquid ex ea commodi consequatur? Quis autem vel eum iure "
         "reprehenderit qui in ea voluptate velit esse quam nihil "
         "molestiae consequatur, vel illum qui dolorem eum fugiat quo "
         "voluptas nulla pariatur? test At vero eos et accusamus et "
         "iusto odio dignissimos ducimus qui blanditiis praesentium "
         "voluptatum deleniti atque corrupti quos dolores et quas "
         "molestias excepturi sint occaecati cupiditate non provident, "
         "similique sunt in culpa qui officia deserunt mollitia animi, "
         "id est laborum et dolorum fuga. Et harum quidem rerum facilis "
         "est et expedita distinctio. Nam libero tempore, cum soluta "
         "nobis est eligendi optio cumque nihil impedit quo minus id "
         "quod maxime placeat facere possimus, omnis voluptas assumenda "
         "est, omnis dolor repellendus. Temporibus autem quibusdam et "
         "aut officiis debitis aut rerum necessitatibus saepe eveniet "
         "ut et voluptates repudiandae sint et molestiae non "
         "recusandae. Itaque earum rerum hic tenetur a sapiente "
         "delectus, ut aut reiciendis voluptatibus maiores alias "
         "consequatur aut perferendis doloribus asperiores repellat. "
         "test")

BOOKS = [
    ("1#2", 1, 2, "This is a test test of the snippet function with "
     "multiple test words"),
    ("1#1", 1, 1, "This is a final final of the snippet function with "
     "multiple final words"),
    ("1#6", 1, 6, "This is a final test of the snippet function with "
     "multiple final words"),
    ("2#2", 2, 2, "Another test of the snippet snippet function with "
     "repeated snippet words"),
    ("3#1", 3, 1, "Yet another test test test of the function function "
     "function"),
    ("4#3", 4, 3, LOREM),
]

# (book_id, author_name, author_score, book_score) — ALL values are the
# reference's printed float32 output, matched to the last digit.
# Rowling = 1 (range const) + 1.5404451 (name:rowling BM25): under the
# true UnicodeWords default tokenizer every author name is exactly two
# tokens ("J.K. Rowling" → [j.k, rowling]), so dl == avgdl and the tf
# norm is exactly 1 → score = idf.  (Rounds 2-3 documented a divergence
# here — 2.4239408 vs the reference's 2.540445 — and attributed it to
# the reference's issue #2530; the real cause was this engine's default
# tokenizer splitting "J.K." into three tokens.  Fixed in round 4; the
# golden is now reference-exact.)
ROWLING = 1.0 + 1.5404451
WANT = [
    (1, "J.K. Rowling", ROWLING, 0.0),
    (1, "Stephen King", 1.0, 0.45681813),
    (1, "Sami Bowling", 1.0, 0.35745716),
    (2, "Stephen King", 1.0, 0.36441684),
    (3, "J.K. Rowling", ROWLING, 0.4624617),
    (4, "Agatha Christie", 1.0, 0.20612015),
]


def test_split_predicate_scored_join_golden(spark):
    authors = spark.createDataFrame(AUTHORS, "id int, name string, age int")
    books = spark.createDataFrame(BOOKS,
                                  "bk string, id int, author_id int, "
                                  "content string")
    a_idx = build_index(authors, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    b_idx = build_index(books, IndexSchema(
        key_field="bk", text_fields=[FieldConfig(name="content")]))

    # a-side: must(age @@@ '>50' — indexed range, const 1.0) +
    # should(name:Rowling — BM25 on top)
    a_q = ast.Boolean(must=[ast.Range("age", lower=50,
                                      lower_inclusive=False)],
                      should=[ast.Term("name", "rowling")])
    a_scores = compile_query(a_idx, a_q) \
        .select(F.col("doc_id").alias("aid"),
                F.col("score").alias("author_score"))
    # b-side: content:test
    b_scores = compile_query(b_idx, ast.Term("content", "test")) \
        .select(F.col("doc_id").alias("bbk"),
                F.col("score").alias("book_score"))
    # name-side OR arm (which rows the text disjunct admits)
    name_ids = compile_query(a_idx, ast.Term("name", "rowling")) \
        .select(F.col("doc_id").alias("nid"))

    j = (books
         .join(a_scores, books["author_id"] == F.col("aid"))   # AND age>50
         .join(b_scores, books["bk"] == F.col("bbk"), "left")
         .join(name_ids, books["author_id"] == F.col("nid"), "left")
         .filter(F.col("bbk").isNotNull() | F.col("nid").isNotNull())
         .join(authors.select(F.col("id").alias("aid2"),
                              F.col("name").alias("author_name")),
               F.col("author_id") == F.col("aid2"))
         .select(F.col("id").alias("book_id"), "author_name",
                 "author_score",
                 F.coalesce("book_score", F.lit(0.0)).alias("book_score"))
         .orderBy("book_id", "author_name"))
    got = [(r["book_id"], r["author_name"], r["author_score"],
            r["book_score"]) for r in j.collect()]
    want = sorted(WANT, key=lambda r: (r[0], r[1]))
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=2e-6), g
        assert g[3] == pytest.approx(w[3], abs=2e-6), g
