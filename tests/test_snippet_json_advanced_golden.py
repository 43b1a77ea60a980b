"""snippet_json_02_advanced.out golden (PUBLIC reference behavior,
tables replicated inline): the three-table scored-join matrix — JSON
path queries (metadata.content / metadata.text / metadata.review) with
per-side BM25 scores float32-exact, snippets + positions rendered over
the extracted JSON values, cross-table OR keeping non-matching sides
at score 0, and LEFT JOIN null-extension for the review-less book.

The scores only come out right with fieldnorms-disabled JSON BM25
(per-doc fieldnorm 1, segment-average avgdl) — see FieldConfig.

Ref: pg_search/tests/pg_regress/expected/snippet_json_02_advanced.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippet, with_snippet_positions
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

AUTHORS = [
    (1, "J.K. Rowling",
     '{"age": 55, "text": "British author best known for the Harry '
     'Potter fantasy series"}'),
    (2, "Stephen King",
     '{"age": 75, "text": "American author known for his horror and '
     'supernatural fiction novels"}'),
    (3, "Agatha Christie",
     '{"age": 80, "text": "English writer known for her detective '
     'novels featuring Hercule Poirot"}'),
    (4, "Dan Brown",
     '{"age": 60, "text": "American author of thriller novels '
     'including The Da Vinci Code"}'),
    (5, "J.R.R. Tolkien",
     '{"age": 100, "text": "English author and philologist famous for '
     'The Lord of the Rings"}'),
]

_LOREM = (
    "test Lorem ipsum dolor sit amet, consectetur adipiscing elit. Sed "
    "do eiusmod tempor incididunt ut labore et dolore magna aliqua. Ut "
    "enim ad minim veniam, quis nostrud exercitation ullamco laboris "
    "nisi ut aliquip ex ea commodo consequat. Duis aute irure dolor in "
    "reprehenderit in voluptate velit esse cillum dolore eu fugiat "
    "nulla pariatur. Excepteur sint occaecat cupidatat non proident, "
    "sunt in culpa qui officia deserunt mollit anim id est laborum. "
    "Sed ut perspiciatis unde omnis iste natus error sit voluptatem "
    "accusantium doloremque laudantium, totam rem aperiam, eaque ipsa "
    "quae ab illo inventore veritatis et quasi architecto beatae vitae "
    "dicta sunt explicabo. Nemo enim ipsam voluptatem quia voluptas "
    "sit aspernatur aut odit aut fugit, sed quia consequuntur magni "
    "dolores eos qui ratione voluptatem sequi nesciunt. Neque porro "
    "quisquam est, qui dolorem ipsum quia dolor sit amet, consectetur, "
    "adipisci velit, sed quia non numquam eius modi tempora incidunt "
    "ut labore et dolore magnam aliquam quaerat voluptatem. Ut enim ad "
    "minima veniam, quis nostrum exercitationem ullam corporis "
    "suscipit laboriosam, nisi ut aliquid ex ea commodi consequatur? "
    "Quis autem vel eum iure reprehenderit qui in ea voluptate velit "
    "esse quam nihil molestiae consequatur, vel illum qui dolorem eum "
    "fugiat quo voluptas nulla pariatur? test At vero eos et accusamus "
    "et iusto odio dignissimos ducimus qui blanditiis praesentium "
    "voluptatum deleniti atque corrupti quos dolores et quas molestias "
    "excepturi sint occaecati cupiditate non provident, similique sunt "
    "in culpa qui officia deserunt mollitia animi, id est laborum et "
    "dolorum fuga. Et harum quidem rerum facilis est et expedita "
    "distinctio. Nam libero tempore, cum soluta nobis est eligendi "
    "optio cumque nihil impedit quo minus id quod maxime placeat "
    "facere possimus, omnis voluptas assumenda est, omnis dolor "
    "repellendus. Temporibus autem quibusdam et aut officiis debitis "
    "aut rerum necessitatibus saepe eveniet ut et voluptates "
    "repudiandae sint et molestiae non recusandae. Itaque earum rerum "
    "hic tenetur a sapiente delectus, ut aut reiciendis voluptatibus "
    "maiores alias consequatur aut perferendis doloribus asperiores "
    "repellat. test")

BOOKS = [
    (1, 2, '{"content": "This is a test test of the snippet function '
           'with multiple test words", "titles": ["test", "snippet", '
           '"function"], "test": "test"}'),
    (2, 2, '{"content": "Another test of the snippet snippet function '
           'with repeated snippet words", "titles": ["test", "test", '
           '"function"], "test": "test"}'),
    (3, 1, '{"content": "Yet another test test test of the function '
           'function function", "titles": ["test", "snippet", "test"], '
           '"test": "test"}'),
    (4, 3, '{"content": "' + _LOREM + '", "titles": ["test", "snippet", '
           '"function"], "test": "test"}'),
]

REVIEWS = [
    (1, 1, '{"review": "This is a test review of the snippet function '
           'with multiple test words"}'),
    (2, 2, '{"review": "Another test review of the snippet snippet '
           'function with repeated snippet words"}'),
    (3, 3, '{"review": "Yet another test review of the function '
           'function function"}'),
    (4, 3, '{"review": "test review of the snippet function with '
           'multiple test words"}'),
    (5, 2, '{"review": "test review of the snippet snippet function '
           'with repeated snippet words"}'),
    (6, 1, '{"review": "test review of the function function '
           'function"}'),
]


@pytest.fixture(scope="module")
def libs(spark):
    def idx(rows, schema_str, extra=None):
        docs = spark.createDataFrame(rows, schema_str)
        fields = [FieldConfig(name="metadata", tokenizer="json")]
        if extra:
            fields.insert(0, FieldConfig(name=extra))
        return docs, build_index(docs, IndexSchema(
            key_field="id", text_fields=fields))
    a_docs, a_idx = idx(AUTHORS, "id long, name string, metadata string",
                        extra="name")
    b_docs, b_idx = idx(BOOKS, "id long, author_id long, metadata string")
    r_docs, r_idx = idx(REVIEWS, "id long, book_id long, metadata string")
    return (a_docs, a_idx), (b_docs, b_idx), (r_docs, r_idx)


def _scores(idx, q, alias):
    return (compile_query(idx, q)
            .select(F.col("doc_id").alias(f"{alias}_did"),
                    F.col("score").alias(f"{alias}_score")))


def _f32(x):
    return np.float32(x) if x is not None else None


Q_BOOK_TEST = ast.Parse("metadata.content:test")
Q_AUTH_HARRY = ast.Parse("metadata.text:Harry")
Q_AUTH_FANTASY = ast.Parse("metadata.text:fantasy")
Q_REV_BOTH = ast.Boolean(must=[ast.Parse("metadata.review:test"),
                               ast.Parse("metadata.review:snippet")])
Q_REV_TEST = ast.Parse("metadata.review:test")
Q_REV_SNIP = ast.Parse("metadata.review:snippet")


def test_cte_join_matrix(libs):
    # Query 1: books⋈authors OR-matched, then inner-matched reviews
    (a_docs, a_idx), (b_docs, b_idx), (r_docs, r_idx) = libs
    bs = _scores(b_idx, Q_BOOK_TEST, "b")
    as_ = _scores(a_idx, Q_AUTH_HARRY, "a")
    rs = _scores(r_idx, Q_REV_BOTH, "r")

    j = (b_docs.alias("b")
         .join(a_docs.select(F.col("id").alias("aid"),
                             F.col("metadata").alias("a_md")),
               F.col("b.author_id") == F.col("aid"))
         .join(bs, F.col("b.id") == bs["b_did"], "left")
         .join(as_, F.col("aid") == as_["a_did"], "left")
         .filter(bs["b_did"].isNotNull() | as_["a_did"].isNotNull())
         .join(r_docs.select(F.col("id").alias("rid"),
                             F.col("book_id"),
                             F.col("metadata").alias("r_md")),
               F.col("b.id") == F.col("book_id"), "left")
         .join(rs, F.col("rid") == rs["r_did"], "inner")
         .select(F.col("b.id").alias("book_id"),
                 F.col("b.metadata").alias("b_md"), "a_md", "r_md",
                 F.coalesce("b_score", F.lit(0.0)).alias("book_score"),
                 F.coalesce("a_score", F.lit(0.0)).alias("author_score"),
                 F.col("r_score").alias("review_score"), "rid"))

    # the hits frame carries the author json under a_md, not metadata —
    # rename around each projection so the snippet source resolves
    out = j.withColumnRenamed("a_md", "metadata")
    out = with_snippet(a_idx, out, Q_AUTH_HARRY, "metadata.text",
                       out_col="author_snippet")
    out = with_snippet_positions(a_idx, out, Q_AUTH_HARRY,
                                 "metadata.text",
                                 out_col="author_positions")
    out = out.withColumnRenamed("metadata", "a_md") \
             .withColumnRenamed("b_md", "metadata")
    out = with_snippet(b_idx, out, Q_BOOK_TEST, "metadata.content",
                       out_col="book_snippet")
    out = with_snippet_positions(b_idx, out, Q_BOOK_TEST,
                                 "metadata.content",
                                 out_col="book_positions")
    out = out.withColumnRenamed("metadata", "b_md") \
             .withColumnRenamed("r_md", "metadata")
    out = with_snippet(r_idx, out, Q_REV_BOTH, "metadata.review",
                       out_col="review_snippet")
    out = with_snippet_positions(r_idx, out, Q_REV_BOTH,
                                 "metadata.review",
                                 out_col="review_positions")

    rows = out.orderBy("book_id", "rid").collect()
    got = [(r["book_id"], r["author_snippet"],
            r["book_snippet"],
            [[p["start"], p["end"]] for p in r["book_positions"]],
            _f32(r["book_score"]), _f32(r["author_score"]),
            r["review_snippet"],
            [[p["start"], p["end"]] for p in r["review_positions"]],
            _f32(r["review_score"])) for r in rows]
    assert got == [
        (1, None,
         "This is a <b>test</b> <b>test</b> of the snippet function "
         "with multiple <b>test</b> words",
         [[10, 14], [15, 19], [58, 62]],
         np.float32("0.21010332"), np.float32(0.0),
         "This is a <b>test</b> review of the <b>snippet</b> function "
         "with multiple <b>test</b> words",
         [[10, 14], [29, 36], [60, 64]], np.float32("0.83736646")),
        (2, None,
         "Another <b>test</b> of the snippet snippet function with "
         "repeated snippet words",
         [[8, 12]], np.float32("0.17698145"), np.float32(0.0),
         "Another <b>test</b> review of the <b>snippet</b> "
         "<b>snippet</b> function with repeated <b>snippet</b> words",
         [[8, 12], [27, 34], [35, 42], [66, 73]],
         np.float32("0.9784815")),
        (2, None,
         "Another <b>test</b> of the snippet snippet function with "
         "repeated snippet words",
         [[8, 12]], np.float32("0.17698145"), np.float32(0.0),
         "<b>test</b> review of the <b>snippet</b> <b>snippet</b> "
         "function with repeated <b>snippet</b> words",
         [[0, 4], [19, 26], [27, 34], [58, 65]],
         np.float32("0.9784815")),
        (3, "British author best known for the <b>Harry</b> Potter "
            "fantasy series",
         "Yet another <b>test</b> <b>test</b> <b>test</b> of the "
         "function function function",
         [[12, 16], [17, 21], [22, 26]],
         np.float32("0.21010332"), np.float32("2.2094626"),
         "<b>test</b> review of the <b>snippet</b> function with "
         "multiple <b>test</b> words",
         [[0, 4], [19, 26], [50, 54]], np.float32("0.83736646")),
    ]


def test_multi_term_author_scores(libs):
    # Query 3: metadata.text:author AND metadata.text:novels
    (a_docs, a_idx), _, _ = libs
    q = ast.Boolean(must=[ast.Parse("metadata.text:author"),
                          ast.Parse("metadata.text:novels")])
    m = compile_query(a_idx, q)
    hits = (m.join(a_docs, m["doc_id"] == a_docs["id"])
            .orderBy("id"))
    out = with_snippet(a_idx, hits, q, "metadata.text",
                       out_col="text_snippet")
    out = with_snippet_positions(a_idx, out, q, "metadata.text",
                                 out_col="text_positions")
    rows = out.select("name", "text_snippet", "text_positions",
                      "score").collect()
    got = [(r["name"], r["text_snippet"],
            [[p["start"], p["end"]] for p in r["text_positions"]],
            np.float32(r["score"])) for r in rows]
    assert got == [
        ("Stephen King",
         "American <b>author</b> known for his horror and supernatural "
         "fiction <b>novels</b>",
         [[9, 15], [62, 68]], np.float32("1.3175524")),
        ("Dan Brown",
         "American <b>author</b> of thriller <b>novels</b> including "
         "The Da Vinci Code",
         [[9, 15], [28, 34]], np.float32("1.3175524")),
    ]


def test_fantasy_author_score(libs):
    # Query 2's author arm: metadata.text:fantasy scores 2.2094626
    (_, a_idx), _, _ = libs
    rows = compile_query(a_idx, Q_AUTH_FANTASY).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in rows] == \
        [(1, np.float32("2.2094626"))]


def test_lorem_book_snippet_truncation(libs):
    # Query 2's book-4 row: default max_chars truncates the lorem text
    _, (b_docs, b_idx), _ = libs
    m = compile_query(b_idx, Q_BOOK_TEST).filter(F.col("doc_id") == 4)
    hits = m.join(b_docs, m["doc_id"] == b_docs["id"])
    out = with_snippet(b_idx, hits, Q_BOOK_TEST, "metadata.content")
    out = with_snippet_positions(b_idx, out, Q_BOOK_TEST,
                                 "metadata.content")
    r = out.collect()[0]
    assert r["snippet"] == (
        "<b>test</b> Lorem ipsum dolor sit amet, consectetur "
        "adipiscing elit. Sed do eiusmod tempor incididunt ut labore "
        "et dolore magna aliqua. Ut enim ad minim")
    assert [[p["start"], p["end"]] for p in r["snippet_positions"]] == \
        [[0, 4], [1317, 1321], [2167, 2171]]
    assert np.float32(r["score"]) == np.float32("0.21010332")
