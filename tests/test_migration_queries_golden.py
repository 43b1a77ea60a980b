"""test_migration_queries.out golden (PUBLIC reference behavior): the
ES-migration docs examples — one query per Elasticsearch concept over a
10-product corpus: match OR/AND, fuzzy match, match_phrase,
match_phrase_prefix, multi_match, dis_max, query_string, term, terms,
range, exists, fuzzy term, prefix, regexp/wildcard, ids, bool,
boosting (negative boost), constant_score, more_like_this, proximity,
match_all/match_none, scoring, boost typmod, snippets (custom tags,
max_chars truncation, positions), and the pdb.agg envelope family
(terms/histogram/date_histogram/range/avg/sum/min/value_count).

Ref: pg_search/tests/pg_regress/expected/test_migration_queries.out
"""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Sleek running shoes for athletes", "footwear", 5, 89.99,
     dt.datetime(2025, 1, 15)),
    (2, "Cheap running shoes on sale", "footwear", 3, 29.99,
     dt.datetime(2025, 2, 20)),
    (3, "Premium leather boots", "footwear", 4, 149.99,
     dt.datetime(2025, 3, 10)),
    (4, "Wireless bluetooth headphones", "electronics", 4, 59.99,
     dt.datetime(2025, 4, 5)),
    (5, "Ergonomic mechanical keyboard", "electronics", 5, 129.99,
     dt.datetime(2025, 5, 12)),
    (6, "Cotton running shorts", "apparel", 4, 34.99,
     dt.datetime(2025, 6, 1)),
    (7, "Waterproof hiking jacket", "apparel", 5, 199.99,
     dt.datetime(2025, 7, 18)),
    (8, "Stainless steel water bottle", "accessories", 4, 24.99,
     dt.datetime(2025, 8, 22)),
    (9, "Yoga mat with carrying strap", "fitness", 3, 39.99,
     dt.datetime(2025, 9, 30)),
    (10, "Digital fitness tracker watch", "electronics", 4, 79.99,
     dt.datetime(2025, 10, 14)),
]


@pytest.fixture(scope="module")
def shop(spark):
    docs = spark.createDataFrame(
        PRODUCTS, "id int, description string, category string, "
                  "rating int, price double, created_at timestamp")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category", tokenizer="literal")],
        numeric_fields=["rating", "price"]))
    return docs, idx


def _ids(shop_fix, q):
    _, idx = shop_fix
    return sorted(r["doc_id"] for r in
                  compile_query(idx, q).select("doc_id").collect())


def test_match_or(shop):
    assert _ids(shop, ast.Match("description", "running shoes")) == \
        [1, 2, 6]


def test_match_and(shop):
    assert _ids(shop, ast.Match("description", "running shoes",
                                conjunction_mode=True)) == [1, 2]


def test_match_with_fuzziness(shop):
    assert _ids(shop, ast.Match("description", "runing shose",
                                distance=2)) == [1, 2, 6]


def test_match_phrase(shop):
    assert _ids(shop, ast.TokenizedPhrase("description",
                                          "running shoes")) == [1, 2]


def test_match_phrase_prefix(shop):
    assert _ids(shop, ast.PhrasePrefix("description",
                                       ["running", "sh"])) == [1, 2, 6]


def test_multi_match_or_across_fields(shop):
    q = ast.Boolean(should=[ast.Match("description", "running shoes"),
                            ast.Match("category", "running shoes")])
    assert _ids(shop, q) == [1, 2, 6]


def test_multi_match_dismax(shop):
    q = ast.DisjunctionMax(
        disjuncts=[ast.Match("description", "running shoes"),
                   ast.Match("category", "running shoes")],
        tie_breaker=0.3)
    assert _ids(shop, q) == [1, 2, 6]


def test_query_string(shop):
    assert _ids(shop, ast.Parse("running AND shoes",
                                field="description")) == [1, 2]


def test_term(shop):
    assert _ids(shop, ast.Term("category", "electronics")) == [4, 5, 10]


def test_terms(shop):
    q = ast.Boolean(should=[ast.Term("category", "electronics"),
                            ast.Term("category", "footwear")])
    assert _ids(shop, q) == [1, 2, 3, 4, 5, 10]


def test_range_pushdown(shop):
    assert _ids(shop, ast.Range("price", lower=10, upper=100)) == \
        [1, 2, 4, 6, 8, 9, 10]


def test_exists(shop):
    assert _ids(shop, ast.Exists("rating")) == list(range(1, 11))


def test_fuzzy_term(shop):
    assert _ids(shop, ast.Fuzzy("description", "shose", distance=2)) == \
        [1, 2]


def test_prefix(shop):
    assert _ids(shop, ast.Fuzzy("description", "runn", distance=0,
                                prefix=True)) == [1, 2, 6]


def test_regexp(shop):
    assert _ids(shop, ast.Regex("description", "run.*ing")) == [1, 2, 6]


def test_wildcard_via_regex(shop):
    assert _ids(shop, ast.Regex("description", "run.*")) == [1, 2, 6]


def test_ids(shop):
    assert _ids(shop, ast.TermSet("id", [1, 2, 3])) == [1, 2, 3]


def test_bool_sql(shop):
    q = ast.Boolean(must=[
        ast.Match("description", "shoes"),
        ast.HeapFilter(ast.All(), "NOT (price >= 100) AND rating = 5")])
    assert _ids(shop, q) == [1]


def test_bool_builder(shop):
    q = ast.Boolean(
        must=[ast.Match("description", "shoes"),
              ast.HeapFilter(ast.All(),
                             "NOT (price >= 100) AND rating = 5")],
        should=[ast.Term("category", "footwear")])
    assert _ids(shop, q) == [1]


def test_boosting_negative(shop):
    q = ast.Boolean(
        must=[ast.Match("description", "shoes")],
        should=[ast.Boost(ast.Match("description", "cheap"), -0.5)])
    assert _ids(shop, q) == [1, 2]
    # the negative boost demotes doc 2 below doc 1
    _, idx = shop
    rows = {r["doc_id"]: r["score"]
            for r in compile_query(idx, q).collect()}
    assert rows[1] > rows[2]


def test_constant_score(shop):
    q = ast.ConstScore(ast.Term("category", "electronics"), 1.5)
    assert _ids(shop, q) == [4, 5, 10]
    _, idx = shop
    assert all(np.float32(r["score"]) == np.float32(1.5)
               for r in compile_query(idx, q).collect())


def test_more_like_this(shop):
    q = ast.MoreLikeThis(document_id=1, fields=["description"])
    assert _ids(shop, q) == [1, 2, 6]


def test_proximity_unordered(shop):
    q = ast.Proximity("description", "running", 3, "shoes")
    assert _ids(shop, q) == [1, 2]


def test_proximity_ordered(shop):
    q = ast.Proximity("description", "running", 3, "shoes", ordered=True)
    assert _ids(shop, q) == [1, 2]


def test_match_all_and_none(shop):
    assert _ids(shop, ast.All()) == list(range(1, 11))
    assert _ids(shop, ast.Empty()) == []


def test_score_pin(shop):
    """description ||| 'shoes' → both docs score 1.312099 (same dl)."""
    _, idx = shop
    got = {r["doc_id"]: np.float32(r["score"]) for r in
           compile_query(idx, ast.Match("description", "shoes")).collect()}
    assert got == {1: np.float32(1.312099), 2: np.float32(1.312099)}


def test_boost_typmod(shop):
    """'shoes'::pdb.boost(2.0) doubles the score, same row set."""
    _, idx = shop
    q = ast.Boost(ast.Match("description", "shoes"), 2.0)
    got = {r["doc_id"]: np.float32(r["score"])
           for r in compile_query(idx, q).collect()}
    assert got == {1: np.float32(2 * 1.312099), 2: np.float32(2 * 1.312099)}


def test_snippet_custom_tags(shop):
    from sparksearch.highlight import with_snippet
    docs, idx = shop
    q = ast.Match("description", "shoes")
    h = compile_query(idx, q).join(
        docs.withColumnRenamed("id", "doc_id"), "doc_id")
    out = {r["doc_id"]: r["snippet"] for r in
           with_snippet(idx, h, q, "description", start_tag="<em>",
                        end_tag="</em>").collect()}
    assert out == {1: "Sleek running <em>shoes</em> for athletes",
                   2: "Cheap running <em>shoes</em> on sale"}


def test_snippets_truncated(shop):
    from sparksearch.highlight import with_snippets
    docs, idx = shop
    q = ast.Match("description", "running shoes")
    h = compile_query(idx, q).join(
        docs.withColumnRenamed("id", "doc_id"), "doc_id")
    out = {r["doc_id"]: list(r["snippets"]) for r in
           with_snippets(idx, h, q, "description",
                         max_chars=20).collect()}
    assert out == {1: ["Sleek <b>running</b> <b>shoes</b>"],
                   2: ["Cheap <b>running</b> <b>shoes</b>"],
                   6: ["Cotton <b>running</b>"]}


def test_snippet_positions(shop):
    from sparksearch.highlight import with_snippet_positions
    docs, idx = shop
    q = ast.Match("description", "shoes")
    h = compile_query(idx, q).join(
        docs.withColumnRenamed("id", "doc_id"), "doc_id")
    out = {r["doc_id"]: [[p["start"], p["end"]]
                         for p in r["snippet_positions"]]
           for r in with_snippet_positions(idx, h, q,
                                           "description").collect()}
    assert out == {1: [[14, 19]], 2: [[14, 19]]}


# --- pdb.agg envelope family -------------------------------------------

def _agg(shop_fix, spec):
    _, idx = shop_fix
    return aggregate(idx, ast.All(), {"agg": spec})["aggregations"]["agg"]


def test_agg_terms(shop):
    env = _agg(shop, {"terms": {"field": "category"}})
    assert {b["key"]: b["doc_count"] for b in env["buckets"]} == {
        "electronics": 3, "footwear": 3, "apparel": 2, "fitness": 1,
        "accessories": 1}
    assert env["sum_other_doc_count"] == 0


def test_agg_histogram(shop):
    env = _agg(shop, {"histogram": {"field": "rating", "interval": 1}})
    assert [(b["key"], b["doc_count"]) for b in env["buckets"]] == \
        [(3.0, 2), (4.0, 5), (5.0, 3)]


def test_agg_date_histogram_30d(shop):
    env = _agg(shop, {"date_histogram": {"field": "created_at",
                                         "fixed_interval": "30d"}})
    got = [(b["key_as_string"], b["doc_count"]) for b in env["buckets"]]
    assert got == [
        ("2025-01-12T00:00:00Z", 1), ("2025-02-11T00:00:00Z", 2),
        ("2025-03-13T00:00:00Z", 1), ("2025-04-12T00:00:00Z", 0),
        ("2025-05-12T00:00:00Z", 2), ("2025-06-11T00:00:00Z", 0),
        ("2025-07-11T00:00:00Z", 1), ("2025-08-10T00:00:00Z", 1),
        ("2025-09-09T00:00:00Z", 1), ("2025-10-09T00:00:00Z", 1)]
    # PG-epoch-µs keys (789955200000000.0 = 2025-01-12)
    assert env["buckets"][0]["key"] == 789955200000000.0


def test_agg_range(shop):
    env = _agg(shop, {"range": {"field": "rating", "ranges": [
        {"to": 3}, {"from": 3, "to": 5}, {"from": 5}]}})
    assert [(b["key"], b["doc_count"]) for b in env["buckets"]] == \
        [("*-3", 0), ("3-5", 7), ("5-*", 3)]


def test_agg_metrics(shop):
    assert _agg(shop, {"avg": {"field": "rating"}})["value"] == 4.1
    assert _agg(shop, {"sum": {"field": "rating"}})["value"] == 41.0
    assert _agg(shop, {"min": {"field": "rating"}})["value"] == 3.0
    assert _agg(shop, {"value_count": {"field": "id"}})["value"] == 10.0
