"""empty_aggregate.out golden (PUBLIC reference behavior): aggregates
over an EMPTY indexed table never error and return the SQL shapes —
COUNT = 0, SUM/AVG/MIN/MAX = NULL, GROUP BY = zero rows — while every
JSON-aggregate shape (paradedb.aggregate) over a zero-segment index
returns SQL ``null``.  Zero MATCHES over a NON-empty index still
produce a real envelope.

Ref: pg_search/tests/pg_regress/expected/empty_aggregate.out
(issue #2996 regression family)
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def empty_idx(spark):
    docs = spark.createDataFrame(
        [], "id long, value int, category string, price double")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", tokenizer="raw")]))
    return idx, docs


def _matched(idx, docs):
    return (compile_query(idx, ast.All())
            .join(docs.withColumnRenamed("id", "doc_id"), "doc_id"))


# ============================================================
# Section 2: simple SQL aggregates — COUNT 0, others NULL
# ============================================================

def test_sql_aggregates_on_empty(empty_idx):
    idx, docs = empty_idx
    row = _matched(idx, docs).agg(
        F.count("*").alias("cnt"),
        F.count("value").alias("cnt_v"),
        F.sum("value").alias("s"),
        F.avg("value").alias("a"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx")).first()
    assert row["cnt"] == 0 and row["cnt_v"] == 0
    assert row["s"] is None and row["a"] is None
    assert row["mn"] is None and row["mx"] is None


# ============================================================
# Section 3: GROUP BY on empty — zero rows, never an error
# ============================================================

def test_group_by_on_empty(empty_idx):
    idx, docs = empty_idx
    m = _matched(idx, docs)
    assert m.groupBy("category").count().count() == 0
    assert (m.groupBy("category")
            .agg(F.count("*"), F.sum("value"), F.avg("value"))
            .orderBy("category").count()) == 0
    assert m.groupBy("category").count().limit(10).count() == 0
    assert (m.groupBy("category", "value").count()
            .orderBy("category", "value").count()) == 0


# ============================================================
# Sections 4-5: every JSON-aggregate shape over an empty index -> null
# ============================================================

EMPTY_AGG_SHAPES = [
    {"value_count": {"value_count": {"field": "value"}}},
    {"value_sum": {"sum": {"field": "value"}}},
    {"value_avg": {"avg": {"field": "value"}}},
    {"value_min": {"min": {"field": "value"}}},
    {"value_max": {"max": {"field": "value"}}},
    {"value_stats": {"stats": {"field": "value"}}},
    {"cat_card": {"cardinality": {"field": "category"}}},
    {"categories": {"terms": {"field": "category"},
                    "aggs": {"count": {"value_count": {"field": "value"}}}}},
    {"value_histogram": {"histogram": {"field": "value", "interval": 10}}},
    {"value_ranges": {"range": {"field": "value",
                                "ranges": [{"to": 50},
                                           {"from": 50, "to": 100},
                                           {"from": 100}]}}},
    {"categories": {"terms": {"field": "category"},
                    "aggs": {"value_ranges": {
                        "range": {"field": "value",
                                  "ranges": [{"to": 50}, {"from": 50}]},
                        "aggs": {"avg_in_range":
                                 {"avg": {"field": "value"}}}}}}},
]


@pytest.mark.parametrize("shape", EMPTY_AGG_SHAPES,
                         ids=lambda s: next(iter(s)))
def test_json_aggregate_empty_index_returns_null(empty_idx, shape):
    idx, _ = empty_idx
    assert aggregate(idx, ast.All(), shape) is None


# ============================================================
# Contrast: zero matches over a NON-empty index -> real envelope
# ============================================================

def test_zero_matches_nonempty_index_real_envelope(spark):
    docs = spark.createDataFrame(
        [(1, 10, "electronics"), (2, 20, "toys")],
        "id long, value int, category string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", tokenizer="raw")]))
    out = aggregate(idx, ast.Term("category", "nonexistent"),
                    {"value_count": {"value_count": {"field": "value"}}})
    assert out == {"aggregations": {"value_count": {"value": 0.0}}}
    # ...and a matching query aggregates normally through the same API
    out = aggregate(idx, ast.All(),
                    {"s": {"sum": {"field": "value"}}})
    assert out["aggregations"]["s"]["value"] == 30.0
