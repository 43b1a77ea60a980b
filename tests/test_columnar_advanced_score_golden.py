"""columnar_advanced_06_score_function golden (PUBLIC reference
behavior): pdb.score() float32-exact across TopK, mixed-type
conjunctions, CTEs, subquery score filters, UNION ALL, joins and CASE.

The reference corpus seeds ``paradedb.random_words(i + 5)`` filler into
each post's content.  The words themselves are irrelevant to BM25 — only
token COUNTS enter tf/df/dl/avgdl (the filler words are unique
non-query terms), so a deterministic filler with the same token count
per row reproduces every pinned score bit-for-bit:
dl(Post i) = 19 prefix tokens + (i+5) filler = i + 24,
N = 103, df(technology) = df(research) = 102, df(science) = 100,
avgdl = (Σ(i+24) + 9 + 8 + 9) / 103 = 7476/103.

Test 3 additionally pins the scoring of indexed non-text equality:
``is_featured = true`` over a declared boolean_field is a Tantivy term
query whose BM25 contribution is exactly idf (fieldnorm=1 ⇒ tf-norm=1):
idf(N=103, df=17) = 1.7821901, while ``rating >= 4`` (a Range) stays
constant-score 1.0.

Ref: pg_search/tests/pg_regress/expected/columnar_advanced_06_score_function.out
     pg_search/src/lib.rs:177-200 (random_words: count-deterministic)
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PREFIX = ("This is content for post {i}. It contains some searchable "
          "text and keywords like technology, science, research, and "
          "development.")

SPECIALS = [
    (101, "Special Technology Post",
     "This post is all about technology and innovative research.",
     "Author Expert", 5, 9999.0, True),
    (102, "Advanced Science Research",
     "Detailed explanation of scientific breakthroughs and research "
     "methodology.",
     "Author Expert", 5, 8888.0, True),
    (103, "Technology Trends Analysis",
     "Analysis of current and future technology trends and developments.",
     "Author Expert", 4, 7777.0, True),
]


def _rows():
    rows = []
    for i in range(1, 101):
        filler = " ".join(f"zqf{i}w{j}" for j in range(i + 5))
        rows.append((i, f"Post {i}",
                     PREFIX.format(i=i) + " " + filler,
                     f"Author {1 + (i % 5)}",
                     1 + (i % 5), float(100 * i), i % 7 == 0))
    return rows + SPECIALS


@pytest.fixture(scope="module")
def score_test(spark):
    docs = spark.createDataFrame(
        _rows(), "id int, title string, content string, author string, "
                 "rating int, views double, is_featured boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title", tokenizer="default"),
                     FieldConfig(name="content", tokenizer="default"),
                     FieldConfig(name="author", tokenizer="default")],
        numeric_fields=["rating", "views"],
        boolean_fields=["is_featured"]))
    return docs, idx


def _scored(docs, idx, q):
    m = compile_query(idx, q).select(F.col("doc_id"),
                                     F.col("score").alias("_score"))
    return docs.join(m, docs["id"] == m["doc_id"], "inner").drop("doc_id")


def _f32(x):
    return np.float32(x)


def test_01_basic_score_topk(score_test):
    """Test 1: ORDER BY title, score, rating DESC LIMIT 10."""
    docs, idx = score_test
    got = (_scored(docs, idx, ast.Parse("technology", field="content"))
           .orderBy(F.col("title").asc(), F.col("_score").asc(),
                    F.col("rating").desc())
           .select("title", "_score", "rating").limit(10).collect())
    exp = [
        ("Post 1", 0.019852143, 2), ("Post 10", 0.018565284, 1),
        ("Post 100", 0.011464216, 1), ("Post 11", 0.018432524, 2),
        ("Post 12", 0.01830165, 3), ("Post 13", 0.018172622, 4),
        ("Post 14", 0.018045401, 5), ("Post 15", 0.017919946, 1),
        ("Post 16", 0.017796224, 2), ("Post 17", 0.017796224, 3),
    ]
    assert [(r["title"], _f32(r["_score"]), r["rating"]) for r in got] == \
        [(t, _f32(s), rt) for t, s, rt in exp]


def test_02_score_with_mixed_selection(score_test):
    """Test 2: research, ORDER BY title, author, rating, views, score
    DESC LIMIT 5."""
    docs, idx = score_test
    got = (_scored(docs, idx, ast.Parse("research", field="content"))
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("rating").asc(), F.col("views").asc(),
                    F.col("_score").desc())
           .select("title", "author", "rating", "views", "_score")
           .limit(5).collect())
    exp = [
        ("Advanced Science Research", "Author Expert", 5, 8888.0, 0.022842946),
        ("Post 1", "Author 2", 2, 100.0, 0.019852143),
        ("Post 10", "Author 1", 1, 1000.0, 0.018565284),
        ("Post 100", "Author 1", 1, 10000.0, 0.011464216),
        ("Post 11", "Author 2", 2, 1100.0, 0.018432524),
    ]
    assert [(r["title"], r["author"], r["rating"], r["views"],
             _f32(r["_score"])) for r in got] == \
        [(t, a, rt, v, _f32(s)) for t, a, rt, v, s in exp]


def test_03_indexed_attr_term_scores_idf(score_test):
    """Test 3: technology AND rating >= 4 AND is_featured = true.
    The boolean term contributes idf(103, 17) = 1.7821901; the range
    contributes 1.0; score = parse + 1.0 + 1.7821901."""
    docs, idx = score_test
    q = ast.Boolean(must=[ast.Parse("technology", field="content"),
                          ast.Range("rating", lower=4),
                          ast.Term("is_featured", True)])
    got = (_scored(docs, idx, q)
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("_score").desc())
           .select("title", "author", "_score").collect())
    exp = [
        ("Post 14", "Author 5", 2.8002355),
        ("Post 28", "Author 4", 2.7986248),
        ("Post 49", "Author 5", 2.796766),
        ("Post 63", "Author 4", 2.7958398),
        ("Post 84", "Author 5", 2.7945325),
        ("Post 98", "Author 4", 2.7936542),
        ("Special Technology Post", "Author Expert", 2.8048325),
        ("Technology Trends Analysis", "Author Expert", 2.8048325),
    ]
    assert [(r["title"], r["author"], _f32(r["_score"])) for r in got] == \
        [(t, a, _f32(s)) for t, a, s in exp]


def test_04_score_in_cte(score_test):
    """Test 4: CTE over 'science OR research', outer rating > 3 is pushed
    into the Tantivy query as a must range clause (score += 1.0)."""
    docs, idx = score_test
    q = ast.Boolean(must=[ast.Parse("science OR research", field="content"),
                          ast.Range("rating", lower=3,
                                    lower_inclusive=False)])
    got = (_scored(docs, idx, q)
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("_score").desc())
           .select("title", "author", "rating", "_score")
           .limit(10).collect())
    exp = [
        ("Advanced Science Research", "Author Expert", 5, 1.022843),
        ("Post 13", "Author 4", 4, 1.0609937),
        ("Post 14", "Author 5", 5, 1.0605667),
        ("Post 18", "Author 4", 4, 1.0589168),
        ("Post 19", "Author 5", 5, 1.0589168),
        ("Post 23", "Author 4", 4, 1.0573545),
        ("Post 24", "Author 5", 5, 1.0566039),
        ("Post 28", "Author 4", 4, 1.0551603),
        ("Post 29", "Author 5", 5, 1.0551603),
        ("Post 3", "Author 4", 4, 1.06562),
    ]
    assert [(r["title"], r["author"], r["rating"], _f32(r["_score"]))
            for r in got] == [(t, a, rt, _f32(s)) for t, a, rt, s in exp]


def test_05_score_filter_in_subquery(score_test):
    """Test 5: relevance > 0.5 compiles to a score_filter over the
    conjunction; 42 rows, all pinned."""
    docs, idx = score_test
    q = ast.ScoreFilter(
        ast.Boolean(must=[ast.Parse("technology", field="content"),
                          ast.Range("rating", lower=3,
                                    lower_inclusive=False)]),
        min_score=0.5)
    got = (_scored(docs, idx, q)
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("_score").desc())
           .select("title", "author", "_score").collect())
    assert len(got) == 42
    by_title = {r["title"]: (r["author"], _f32(r["_score"])) for r in got}
    assert by_title["Post 13"] == ("Author 4", _f32(1.0181726))
    assert by_title["Post 99"] == ("Author 5", _f32(1.0114642))
    assert by_title["Special Technology Post"] == \
        ("Author Expert", _f32(1.0226423))
    assert by_title["Technology Trends Analysis"] == \
        ("Author Expert", _f32(1.0226423))
    # full first-page pin in golden order
    head = [(r["title"], _f32(r["_score"])) for r in got[:8]]
    assert head == [("Post 13", _f32(1.0181726)), ("Post 14", _f32(1.0180454)),
                    ("Post 18", _f32(1.0175538)), ("Post 19", _f32(1.0175538)),
                    ("Post 23", _f32(1.0170883)), ("Post 24", _f32(1.0168648)),
                    ("Post 28", _f32(1.0164347)), ("Post 29", _f32(1.0164347))]


def test_06_score_with_union(score_test):
    """Test 6: UNION ALL of a technology arm and a science-NOT-title
    arm; the NOT compiles to boolean(must=[const_score(exists,0.0)],
    must_not=[parse(title,'technology')]) exactly as the reference plan
    prints, so the second arm's score is the science score alone."""
    docs, idx = score_test
    a = (_scored(docs, idx, ast.Parse("technology", field="content"))
         .select("title", "author", "_score"))
    not_title = ast.Boolean(
        must=[ast.ConstScore(ast.Exists("title"), 0.0)],
        must_not=[ast.Parse("technology", field="title")])
    b = (_scored(docs, idx,
                 ast.Boolean(must=[ast.Parse("science", field="content"),
                                   not_title]))
         .select("title", "author", "_score"))
    got = (a.unionByName(b)
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("_score").desc())
           .limit(10).collect())
    exp = [
        ("Post 1", "Author 2", 0.046778545),
        ("Post 1", "Author 2", 0.019852143),
        ("Post 10", "Author 1", 0.04374626),
        ("Post 10", "Author 1", 0.018565284),
        ("Post 100", "Author 1", 0.027013674),
        ("Post 100", "Author 1", 0.011464216),
        ("Post 11", "Author 2", 0.04343343),
        ("Post 11", "Author 2", 0.018432524),
        ("Post 12", "Author 3", 0.04312505),
        ("Post 12", "Author 3", 0.01830165),
    ]
    assert [(r["title"], r["author"], _f32(r["_score"])) for r in got] == \
        [(t, a_, _f32(s)) for t, a_, s in exp]


def test_07_score_through_join(score_test):
    """Test 7: top-5 technology posts joined to same-author posts whose
    author matched technology; 61 rows, scores pinned per group."""
    docs, idx = score_test
    top5 = (_scored(docs, idx, ast.Parse("technology", field="content"))
            .orderBy(F.col("_score").desc())
            .select("title", "author", "rating", "_score").limit(5))
    authors = (_scored(docs, idx, ast.Parse("technology", field="content"))
               .select("author").distinct())
    b = (docs.join(authors.withColumnRenamed("author", "_a"),
                   docs["author"] == F.col("_a"), "left_semi")
         .select(F.col("title").alias("related_title"),
                 F.col("author").alias("_ba")))
    got = (top5.join(b, (top5["author"] == b["_ba"])
                     & (top5["title"] != b["related_title"]))
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("rating").asc(), F.col("_score").asc(),
                    F.col("related_title").asc())
           .select("title", "author", "rating", "_score", "related_title")
           .collect())
    assert len(got) == 61
    assert (got[0]["title"], _f32(got[0]["_score"]),
            got[0]["related_title"]) == \
        ("Post 1", _f32(0.019852143), "Post 11")
    p2 = [r for r in got if r["title"] == "Post 2"]
    assert len(p2) == 19 and all(_f32(r["_score"]) == _f32(0.019700415)
                                 and r["rating"] == 3 for r in p2)
    p3 = [r for r in got if r["title"] == "Post 3"]
    assert len(p3) == 19 and all(_f32(r["_score"]) == _f32(0.019550992)
                                 for r in p3)
    tail = [(r["title"], _f32(r["_score"]), r["related_title"])
            for r in got[-4:]]
    assert tail == [
        ("Special Technology Post", _f32(0.02264229),
         "Advanced Science Research"),
        ("Special Technology Post", _f32(0.02264229),
         "Technology Trends Analysis"),
        ("Technology Trends Analysis", _f32(0.02264229),
         "Advanced Science Research"),
        ("Technology Trends Analysis", _f32(0.02264229),
         "Special Technology Post"),
    ]


def test_08_score_in_case_expression(score_test):
    """Test 8: research OR development AND rating > 4 → every match is
    High Relevance (range adds 1.0 so score > 0.8 always)."""
    docs, idx = score_test
    q = ast.Boolean(must=[ast.Parse("research OR development",
                                    field="content"),
                          ast.Range("rating", lower=4,
                                    lower_inclusive=False)])
    cat = (F.when(F.col("_score") > 0.8, "High Relevance")
           .when(F.col("_score") > 0.5, "Medium Relevance")
           .otherwise("Low Relevance"))
    got = (_scored(docs, idx, q)
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("_score").desc())
           .select("title", "author", "rating", cat.alias("cat"))
           .collect())
    assert len(got) == 22
    assert all(r["cat"] == "High Relevance" for r in got)
    assert got[0]["title"] == "Advanced Science Research"
    assert got[-1]["title"] == "Special Technology Post"
    assert [r["title"] for r in got if not r["title"].startswith("Post")] == \
        ["Advanced Science Research", "Special Technology Post"]


def test_09_verify_scores(score_test):
    """Final verification block: technology AND rating > 4 → 21 rows."""
    docs, idx = score_test
    q = ast.Boolean(must=[ast.Parse("technology", field="content"),
                          ast.Range("rating", lower=4,
                                    lower_inclusive=False)])
    got = (_scored(docs, idx, q)
           .orderBy(F.col("title").asc(), F.col("author").asc(),
                    F.col("_score").desc())
           .select("title", "author", "rating", "_score").collect())
    assert len(got) == 21
    by_title = {r["title"]: _f32(r["_score"]) for r in got}
    assert by_title["Post 14"] == _f32(1.0180454)
    assert by_title["Post 4"] == _f32(1.0194038)
    assert by_title["Post 99"] == _f32(1.0114642)
    assert by_title["Special Technology Post"] == _f32(1.0226423)
    assert all(r["rating"] == 5 for r in got
               if r["title"] != "Special Technology Post")
