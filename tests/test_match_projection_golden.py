"""issue_3051 + issue_join_pre_filter goldens (PUBLIC reference
behavior):

- issue_3051: `description @@@ 'shoes'` used as a PROJECTED boolean
  expression (not a WHERE filter) — every row returns with its match
  flag; on mock_items only ids 3,4,5 are true.
- issue_join_pre_filter: a 10k-row corpus of IDENTICAL docs joined to a
  filtered dimension — every matched post scores the same f32-exact
  0.00019978978 (four terms, each idf = 4.9947444e-05 at df=N=10000:
  the f32-before-log rounding family of score_anti_join.out), and the
  TopK page is stable under the all-ties sort.

Ref: pg_search/tests/pg_regress/expected/issue_3051.out
     pg_search/tests/pg_regress/expected/issue_join_pre_filter.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def test_match_as_projected_boolean(mock_index):
    """issue_3051: the match flag as a SELECT-list expression."""
    m = compile_query(mock_index,
                      ast.Parse("shoes", field="description")) \
        .select(F.col("doc_id").alias("mk"))
    docs = mock_index.docs
    got = (docs.join(m, docs["id"] == F.col("mk"), "left")
           .select("id", F.col("mk").isNotNull().alias("matches"))
           .orderBy("id").collect())
    flags = {r["id"]: r["matches"] for r in got}
    assert len(flags) == 41
    assert {i for i, v in flags.items() if v} == {3, 4, 5}


@pytest.fixture(scope="module")
def prefilter(spark):
    posts = spark.createDataFrame(
        [(i, "how using get create", i % 1000 + 1)
         for i in range(1, 10001)],
        "id int, title string, owner_user_id int")
    users = spark.createDataFrame(
        [(i, 200) for i in range(1, 10001)], "id int, reputation int")
    p_idx = build_index(posts, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title", tokenizer="unicode_words")],
        numeric_fields=["owner_user_id"]))
    return posts, users, p_idx


def test_join_pre_filter_scores(prefilter):
    posts, users, p_idx = prefilter
    m = compile_query(p_idx, ast.Match("title", "how using get create"))
    matched = posts.join(m, posts["id"] == m["doc_id"]) \
        .join(users.filter("reputation > 100")
              .select(F.col("id").alias("uid")),
              F.col("owner_user_id") == F.col("uid"), "left_semi")
    top = (matched.orderBy(F.col("score").desc(), F.col("id").asc())
           .limit(10).select("id", "title", "score").collect())
    assert len(top) == 10
    assert [r["id"] for r in top] == list(range(1, 11))
    assert all(np.float32(r["score"]) == np.float32(0.00019978978)
               for r in top)
    assert all(r["title"] == "how using get create" for r in top)
    # the full match set is every post (identical docs)
    assert matched.count() == 10000
