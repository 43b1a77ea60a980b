"""test-fruit-types-issue + issue_5635 goldens (PUBLIC reference
behavior):

- #2963 "incompatible fruit types in tree": grouped aggregates mixing
  SUM(float), MAX(int), AVG(int), COUNT(*) over keyword-text group keys
  and mixed-typed fast fields must compute, with pinned values over the
  deterministic 100-row corpus.
- #5635 SegmentedTopK over a deferred sort column: files filtered by an
  IN-subquery over a searched dimension, ORDER BY a non-key text column
  with LIMIT — first page pinned.

Ref: pg_search/tests/pg_regress/expected/test-fruit-types-issue.out
     pg_search/tests/pg_regress/expected/issue_5635.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def users(spark):
    rows = [(i, f"00000000-0000-0000-0000-{i:012d}",
             ["alice", "bob", "charlie"][i % 3], "blue",
             20 + (i % 30), float(100 + i * 10), (i % 5) + 1)
            for i in range(1, 101)]
    docs = spark.createDataFrame(
        rows, "id long, uuid string, name string, color string, "
              "age int, price double, rating int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="uuid", tokenizer="keyword"),
                     FieldConfig(name="name", tokenizer="keyword"),
                     FieldConfig(name="color", tokenizer="keyword")],
        numeric_fields=["age", "price", "rating"]))
    return docs, idx


def _blue(users_fix):
    docs, idx = users_fix
    m = compile_query(idx, ast.Parse("blue", field="color")) \
        .select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"], "left_semi")


def test_2963_mixed_agg_types(users):
    got = (_blue(users).groupBy("name")
           .agg(F.sum("price").alias("s"), F.max("rating").alias("mx"),
                F.avg("age").alias("a"))
           .orderBy("name").collect())
    exp = [("alice", 20130.0, 5, 32.8181818181818),
           ("bob", 20570.0, 5, 33.4411764705882),
           ("charlie", 19800.0, 5, 34.5454545454545)]
    for r, (n, s, mx, a) in zip(got, exp):
        assert (r["name"], r["s"], r["mx"]) == (n, s, mx)
        assert r["a"] == pytest.approx(a, abs=1e-10)


def test_2963_count_sum_max(users):
    got = (_blue(users).groupBy("name")
           .agg(F.count("*").alias("c"), F.sum("price").alias("s"),
                F.max("rating").alias("mx"))
           .orderBy("name").collect())
    assert [tuple(r) for r in got] == [
        ("alice", 33, 20130.0, 5), ("bob", 34, 20570.0, 5),
        ("charlie", 33, 19800.0, 5)]


@pytest.fixture(scope="module")
def docs5635(spark):
    documents = spark.createDataFrame(
        [("doc-01", "PROJECT_ALPHA design review"),
         ("doc-02", "BETA_GROUP budget overview"),
         ("doc-03", "PROJECT_ALPHA roadmap planning"),
         ("doc-04", "GAMMA_DIVISION quarterly report"),
         ("doc-05", "PROJECT_ALPHA feedback notes")],
        "id string, category string")
    files = spark.createDataFrame(
        [(i, f"doc-{(i - 1) % 5 + 1:02d}", f"File Title {i:03d}")
         for i in range(1, 51)],
        "id int, document_id string, title string")
    d_idx = build_index(documents, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category",
                                 tokenizer="unicode_words")]))
    return documents, files, d_idx


def test_5635_deferred_sort_topk(docs5635):
    documents, files, d_idx = docs5635
    m = compile_query(d_idx, ast.Parse("PROJECT_ALPHA",
                                       field="category")) \
        .select(F.col("doc_id").alias("dk"))
    matched_docs = documents.join(m, documents["id"] == F.col("dk"),
                                  "left_semi")
    got = (files.join(matched_docs.select(F.col("id").alias("did")),
                      files["document_id"] == F.col("did"), "left_semi")
           .orderBy(F.col("title").asc()).limit(3)
           .select("id", "title").collect())
    assert [tuple(r) for r in got] == [
        (1, "File Title 001"), (3, "File Title 003"),
        (5, "File Title 005")]
