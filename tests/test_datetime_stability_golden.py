"""datetime_stability.out golden (PUBLIC reference behavior): datetime
round-trips, range filters with mixed bounds, TopK ordering, MIN/MAX,
GROUP BY, and the date_histogram envelope — bucket keys are PG-epoch
MICROSECONDS with a UTC second-precision key_as_string.

Ref: pg_search/tests/pg_regress/expected/datetime_stability.out
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import run_aggs
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import parse_query

EVENTS = [(i, f"event {i}",
           dt.datetime(2024, 1, i, 9 + i, 0, 0))
          for i in range(1, 6)]


@pytest.fixture(scope="module")
def ev(spark):
    docs = spark.createDataFrame(EVENTS,
                                 "id long, description string, "
                                 "occurred_at timestamp")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="occurred_at",
                                 tokenizer="datetime")]))
    return idx, docs


def test_roundtrip(ev):
    idx, docs = ev
    m = compile_query(idx, ast.All())
    got = (m.join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
           .orderBy("doc_id").select("doc_id", "occurred_at").collect())
    assert [(r["doc_id"], r["occurred_at"]) for r in got] == \
        [(i, t) for i, _, t in EVENTS]


def test_range_filter_mixed_bounds(ev):
    # '[2024-01-02T00:00:00Z TO 2024-01-04T00:00:00Z}' — inclusive
    # lower, EXCLUSIVE upper -> ids 2, 3
    idx, _ = ev
    node = parse_query(
        "occurred_at:[2024-01-02T00:00:00Z TO 2024-01-04T00:00:00Z}",
        "description", idx.schema)
    got = sorted(r["doc_id"] for r in compile_query(idx, node).collect())
    assert got == [2, 3]


def test_topk_ordering(ev):
    idx, docs = ev
    m = compile_query(idx, ast.All())
    j = m.join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
    asc = [r["doc_id"] for r in
           j.orderBy(F.col("occurred_at").asc()).limit(3).collect()]
    desc = [r["doc_id"] for r in
            j.orderBy(F.col("occurred_at").desc()).limit(3).collect()]
    assert asc == [1, 2, 3] and desc == [5, 4, 3]


def test_min_max_group_by(ev):
    idx, docs = ev
    m = compile_query(idx, ast.All())
    j = m.join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
    row = j.agg(F.min("occurred_at").alias("mn"),
                F.max("occurred_at").alias("mx"),
                F.count("*").alias("n")).first()
    assert row["mn"] == EVENTS[0][2] and row["mx"] == EVENTS[-1][2]
    assert row["n"] == 5
    assert j.groupBy("occurred_at").count().count() == 5


def test_date_histogram_envelope(ev):
    # bucket keys: PG-epoch MICROS; key_as_string: UTC RFC3339 seconds
    idx, docs = ev
    res = run_aggs(docs, {
        "by_day": {"date_histogram": {"field": "occurred_at",
                                      "fixed_interval": "1d"}}})
    buckets = res["aggregations"]["by_day"]["buckets"]
    assert [b["key_as_string"] for b in buckets] == [
        f"2024-01-0{d}T00:00:00Z" for d in range(1, 6)]
    # 2024-01-01 = PG-epoch 757382400 s (reference value verbatim)
    assert buckets[0]["key"] == 757382400000000.0
    assert all(b["doc_count"] == 1 for b in buckets)


def test_date_histogram_nested_subagg(ev):
    idx, docs = ev
    res = run_aggs(docs, {
        "by_day": {"date_histogram": {"field": "occurred_at",
                                      "fixed_interval": "1d"},
                   "aggs": {"count": {"value_count": {"field": "id"}}}}})
    buckets = res["aggregations"]["by_day"]["buckets"]
    assert all(b["count"]["value"] == 1.0 for b in buckets)
    assert buckets[0]["key_as_string"] == "2024-01-01T00:00:00Z"
