"""text_field_agg_regression.out golden (PUBLIC reference behavior,
table replicated inline): metric aggregations (value_count) over TEXT
fields work as sub-aggregations inside bucket aggregations — the
reference pinned this after tantivy's "unexpected type Str" bug; this
engine must produce the same envelopes on the same 500-row
high-cardinality corpus.

Ref: pg_search/tests/pg_regress/expected/text_field_agg_regression.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast


@pytest.fixture(scope="module")
def text_agg_index(spark):
    rows = [(i, f"language_{i}", i % 100) for i in range(1, 501)]
    docs = spark.createDataFrame(rows, "id long, name string, score int")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword",
                                 lowercase=False)]))


def test_group_by_text_order_by_count(text_agg_index):
    # TEST 1: GROUP BY name ORDER BY count(name) DESC, name DESC LIMIT 5
    # (all counts are 1, so the name DESC tiebreak decides)
    idx = text_agg_index
    got = (idx.docs.groupBy("name").agg(F.count("name").alias("c"))
           .orderBy(F.col("c").desc(), F.col("name").desc())
           .limit(5).select("name").collect())
    assert [r[0] for r in got] == [
        "language_99", "language_98", "language_97", "language_96",
        "language_95"]


def test_value_count_text_under_terms(text_agg_index):
    # TEST 2: value_count on the text field grouped by itself — every
    # bucket's envelope is {"value": 1.0} and no type error is raised
    res = search_aggregate(text_agg_index, ast.All(), {
        "g": {"terms": {"field": "name", "size": 500},
              "aggs": {"count": {"value_count": {"field": "name"}}}}})
    buckets = res["aggregations"]["g"]["buckets"]
    assert len(buckets) == 500
    assert all(b["count"]["value"] == 1.0 for b in buckets)


def test_value_count_text_under_histogram(text_agg_index):
    # TEST 3: histogram(score, 25) + value_count(name) sub-agg
    res = search_aggregate(text_agg_index, ast.All(), {
        "h": {"histogram": {"field": "score", "interval": 25},
              "aggs": {"name_count": {"value_count": {"field": "name"}}}}})
    got = [(b["key"], b["doc_count"], b["name_count"]["value"])
           for b in res["aggregations"]["h"]["buckets"]]
    assert got == [(0.0, 125, 125.0), (25.0, 125, 125.0),
                   (50.0, 125, 125.0), (75.0, 125, 125.0)]


def test_value_count_text_under_range(text_agg_index):
    # TEST 4: range buckets + value_count(name) sub-agg
    res = search_aggregate(text_agg_index, ast.All(), {
        "r": {"range": {"field": "score",
                        "ranges": [{"to": 50}, {"from": 50}]},
              "aggs": {"name_count": {"value_count": {"field": "name"}}}}})
    got = [(b["key"], b["doc_count"], b["name_count"]["value"])
           for b in res["aggregations"]["r"]["buckets"]]
    assert got == [("*-50", 250, 250.0), ("50-*", 250, 250.0)]


def test_value_count_text_top_level(text_agg_index):
    # TEST 5: top-level value_count over the text field = 500
    res = search_aggregate(text_agg_index, ast.All(), {
        "c": {"value_count": {"field": "name"}}})
    assert res["aggregations"]["c"]["value"] == 500.0
