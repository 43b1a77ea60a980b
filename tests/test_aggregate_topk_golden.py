"""aggregate_topk.out golden (PUBLIC reference behavior): GROUP BY +
ORDER BY aggregate + LIMIT over search matches — top-k by COUNT(*),
by SUM(field), bottom-k, OFFSET paging, LIMIT 1, LIMIT > group count —
with the reference's own caveat that tie GROUP membership is
implementation-defined (we pin counts and break ties explicitly where
needed).  The Spark plan collapses the sort+limit over the aggregated
groups to TakeOrderedAndProject after a partial (map-side) aggregate.

Ref: pg_search/tests/pg_regress/expected/aggregate_topk.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def matched(spark, mock_index):
    docs = mock_items(spark)
    m = compile_query(mock_index, ast.All()).select("doc_id")
    return docs.join(m, docs["id"] == m["doc_id"]).drop("doc_id")


def _g(matched):
    return matched.groupBy("category")


def test_topk_by_count_desc(matched):
    got = (_g(matched).agg(F.count("*").alias("count"))
           .orderBy(F.col("count").desc(), F.col("category").asc())
           .limit(3).collect())
    # Footwear 6, Electronics 5, then the 4-count tie group (category
    # asc tiebreak -> Apparel); the golden's third row is any 4-count
    # category ("tie-breaking may differ" — Test 9)
    assert [(r["category"], r["count"]) for r in got[:2]] == \
        [("Footwear", 6), ("Electronics", 5)]
    assert got[2]["count"] == 4


def test_topk_by_sum_desc(matched):
    got = (_g(matched).agg(F.sum("rating").alias("sum"))
           .orderBy(F.col("sum").desc(), F.col("category").asc())
           .limit(3).collect())
    assert [(r["category"], r["sum"]) for r in got] == \
        [("Footwear", 24), ("Electronics", 20), ("Home Decor", 18)]


def test_bottom_k(matched):
    got = (_g(matched).agg(F.count("*").alias("count"))
           .orderBy(F.col("count").asc(), F.col("category").asc())
           .limit(2).collect())
    # Beauty 3 and Furniture 3 are the two smallest groups
    assert sorted((r["category"], r["count"]) for r in got) == \
        [("Beauty", 3), ("Furniture", 3)]


def test_offset_paging(matched):
    got = (_g(matched).agg(F.count("*").alias("count"))
           .orderBy(F.col("count").desc(), F.col("category").asc())
           .offset(1).limit(2).collect())
    assert got[0]["category"] == "Electronics" and got[0]["count"] == 5
    assert got[1]["count"] == 4


def test_full_parity_rows(matched):
    got = (_g(matched).agg(F.count("*").alias("count"),
                           F.sum("rating").alias("sum"))
           .orderBy(F.col("count").desc(), F.col("category").asc())
           .collect())
    assert [(r["category"], r["count"], r["sum"]) for r in got] == [
        ("Footwear", 6, 24), ("Electronics", 5, 20),
        ("Apparel", 4, 17), ("Books", 4, 10), ("Groceries", 4, 17),
        ("Home Decor", 4, 18), ("Photography", 4, 18), ("Toys", 4, 12),
        ("Beauty", 3, 10), ("Furniture", 3, 12)]


def test_multiple_aggregates_order_by_sum(matched):
    got = (_g(matched).agg(F.count("*").alias("count"),
                           F.sum("rating").alias("sum"),
                           F.min("rating").alias("mn"),
                           F.max("rating").alias("mx"))
           .orderBy(F.col("sum").desc(), F.col("category").asc())
           .limit(3).collect())
    assert [(r["category"], r["count"], r["sum"], r["mn"], r["mx"])
            for r in got] == [("Footwear", 6, 24, 3, 5),
                              ("Electronics", 5, 20, 3, 5),
                              ("Home Decor", 4, 18, 4, 5)]


def test_limit_one_and_limit_past_groups(matched):
    g = (_g(matched).agg(F.count("*").alias("count"))
         .orderBy(F.col("count").desc(), F.col("category").asc()))
    top = g.limit(1).collect()
    assert [(r["category"], r["count"]) for r in top] == [("Footwear", 6)]
    assert g.limit(100).count() == 10


def test_plan_is_topk_after_partial_agg(matched):
    """sort+limit over the aggregate collapses to
    TakeOrderedAndProject, with a partial (map-side) HashAggregate
    before the exchange — the distributed top-k-groups shape."""
    df = (_g(matched).agg(F.count("*").alias("count"))
          .orderBy(F.col("count").desc()).limit(3))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan