"""score_anti_join.out golden (PUBLIC reference behavior, tables
replicated inline): BM25 scores survive anti-join (NOT EXISTS) and
semi-join (EXISTS) plans unchanged, float32-exact — including the
corpus where every doc matches (df = N = 10000), whose idf only comes
out right when the ratio rounds to float32 BEFORE the log (Tantivy's
Score=f32 arithmetic: 4.9947444e-05, not the all-f64 4.9996250e-05).
Test 3 additionally pins fuzzy queries scoring a CONSTANT 1.0
(FuzzyTermQuery → ConstScorer): the dismax-boosted fuzzy arm
contributes exactly 2.0 of the 2.0000873 total.

Ref: pg_search/tests/pg_regress/expected/score_anti_join.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

N_ITEMS = 10000
N_ENTRIES = 500


@pytest.fixture(scope="module")
def aj(spark):
    items = spark.createDataFrame(
        [(i, f"Item {i}", "active") for i in range(1, N_ITEMS + 1)],
        "id long, title string, state string")
    entries = spark.createDataFrame(
        [(i, i, "user1") for i in range(1, N_ENTRIES + 1)],
        "id long, item_id long, user_id string")
    idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title"),
                     FieldConfig(name="state")]))
    return idx, items, entries


def _top5(idx, items, entries, query, join_type):
    m = compile_query(idx, query)
    hits = m.join(items, m["doc_id"] == items["id"]).select(
        "id", "title", "score")
    user1 = entries.filter(F.col("user_id") == "user1").select("item_id")
    j = hits.join(user1, hits["id"] == user1["item_id"], join_type)
    rows = (j.orderBy(F.col("score").desc(), F.col("id").asc())
            .limit(5).select("id", "title", "score").collect())
    return [(r[0], r[1], np.float32(r[2])) for r in rows]


S_ACTIVE = np.float32("4.9947444e-05")


def test_not_exists_anti_join_scores(aj):
    idx, items, entries = aj
    got = _top5(idx, items, entries, ast.Term("state", "active"),
                "left_anti")
    assert got == [(i, f"Item {i}", S_ACTIVE) for i in range(501, 506)]


def test_exists_semi_join_scores(aj):
    idx, items, entries = aj
    got = _top5(idx, items, entries, ast.Term("state", "active"),
                "left_semi")
    assert got == [(i, f"Item {i}", S_ACTIVE) for i in range(1, 6)]


def test_combined_dismax_fuzzy_anti_join(aj):
    # Test 3: two @@@ predicates AND'ed (scores sum) — a jsonb boolean
    # term on state plus a should(dismax(boost(2.0, fuzzy-match 'Item'),
    # match 'Item')) on title; the fuzzy arm scores const 1.0 * boost
    idx, items, entries = aj
    q = ast.Boolean(must=[
        ast.Boolean(must=[ast.Term("state", "active")]),
        ast.Boolean(should=[ast.DisjunctionMax(
            tie_breaker=0.75,
            disjuncts=[
                ast.Boost(
                    ast.Match("title", "Item", conjunction_mode=True,
                              distance=1), 2.0),
                ast.Match("title", "Item", conjunction_mode=True),
            ])]),
    ])
    got = _top5(idx, items, entries, q, "left_anti")
    want_score = np.float32("2.0000873")
    assert [(i, t) for i, t, _ in got] == \
        [(i, f"Item {i}") for i in range(501, 506)]
    assert all(s == want_score for _, _, s in got), got
