"""groupby_aggregate_highcard.out golden (PUBLIC reference behavior,
table replicated inline): GROUP BY over a 101-group corpus (ratings
1..100 with count=rating, plus one NULL row) under a 10-bucket cap —
an ORDER-BY-key LIMIT+OFFSET within the cap is answered exactly from
the ordered prefix, LIMIT 0 yields nothing, ORDER BY count puts the
NULL group (count 1) first, and a raised cap returns every group with
the NULL key last under ASC.

Ref: pg_search/tests/pg_regress/expected/groupby_aggregate_highcard.out
"""

import pytest
from pyspark.sql import functions as F

import sparksearch.config as cfg
from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def products(spark):
    rows = [(i, r) for i, r in enumerate(
        [r for r in range(1, 101) for _ in range(r)] + [None], start=1)]
    docs = spark.createDataFrame(rows, "id long, rating int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="rating", tokenizer="raw",
                                 source="cast(rating as string)")]))
    return idx, docs


def _grouped(idx, docs):
    m = compile_query(idx, ast.All()).select("doc_id")
    d = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
    return d.groupBy("rating").agg(F.count("*").alias("count"))


def test_limit_offset_ordered_prefix(products):
    # cap 10: LIMIT 5 OFFSET 5 over ORDER BY rating — answered exactly
    idx, docs = products
    old = cfg.get().max_agg_buckets
    cfg.set(max_agg_buckets=10)
    try:
        res = search_aggregate(idx, ast.All(), {
            "g": {"terms": {"field": "rating", "size": 10,
                            "order": {"_key": "asc"}}}})
        buckets = res["aggregations"]["g"]["buckets"][5:10]
        assert [(int(b["key"]), b["doc_count"]) for b in buckets] == \
            [(r, r) for r in range(6, 11)]
    finally:
        cfg.set(max_agg_buckets=old)


def test_order_by_count_null_group_first(products):
    # ORDER BY 2 LIMIT 5: the NULL group (count 1) sorts before rating
    # 1 (count 1 ties -> NULL key first, matching the golden's output)
    idx, docs = products
    rows = (_grouped(idx, docs)
            .orderBy(F.col("count").asc(),
                     F.col("rating").asc_nulls_first())
            .limit(5).collect())
    assert [(r["rating"], r["count"]) for r in rows] == [
        (None, 1), (1, 1), (2, 2), (3, 3), (4, 4)]


def test_limit_zero(products):
    idx, docs = products
    assert (_grouped(idx, docs).orderBy("rating").limit(0)
            .collect() == [])


def test_high_limit_all_groups_null_last(products):
    idx, docs = products
    rows = (_grouped(idx, docs)
            .orderBy(F.col("rating").asc_nulls_last())
            .limit(10000).collect())
    assert len(rows) == 101
    assert [(r["rating"], r["count"]) for r in rows[:3]] == \
        [(1, 1), (2, 2), (3, 3)]
    assert [(r["rating"], r["count"]) for r in rows[-2:]] == \
        [(100, 100), (None, 1)]
