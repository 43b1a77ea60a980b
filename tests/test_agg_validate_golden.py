"""agg-validate.out golden (PUBLIC reference behavior, table replicated
inline): pdb.agg()/paradedb.aggregate() field validation — invalid
field references error with the reference's exact message (recursively,
through nested aggs) — plus single-value metrics on datetime fields
carrying PG-epoch-µs values with key_as_string ISO timestamps.

Ref: pg_search/tests/pg_regress/expected/agg-validate.out
"""

import datetime as dt

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast

ROWS = [
    (1, "Ergonomic keyboard", 5, dt.datetime(2024, 1, 1, 10)),
    (2, "Wireless mouse", 4, dt.datetime(2024, 1, 2, 11)),
    (3, "USB hub", 3, dt.datetime(2024, 1, 3, 12)),
    (4, "Monitor stand", 5, dt.datetime(2024, 1, 4, 13)),
    (5, "Laptop bag", 4, dt.datetime(2024, 1, 5, 14)),
]

ERR = ("Aggregation references invalid field '{}'. Available indexed "
       "fields are: [created_at, description, id, rating]")


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, description string, rating int, "
        "created_at timestamp")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))


def _agg(idx, spec):
    return search_aggregate(idx, ast.All(), spec)["aggregations"]


def test_1_valid_avg(idx):
    assert _agg(idx, {"a": {"avg": {"field": "rating"}}})["a"] == \
        {"value": 4.2}


def test_2_valid_terms(idx):
    env = _agg(idx, {"t": {"terms": {"field": "rating"}}})["t"]
    assert sorted((b["key"], b["doc_count"]) for b in env["buckets"]) == \
        [(3, 1), (4, 2), (5, 2)]
    assert env["sum_other_doc_count"] == 0
    assert env["doc_count_error_upper_bound"] == 0


def test_3_valid_date_histogram(idx):
    env = _agg(idx, {"h": {"date_histogram":
                           {"field": "created_at",
                            "fixed_interval": "30d"}}})["h"]
    assert [(b["key"], b["doc_count"], b["key_as_string"])
            for b in env["buckets"]] == \
        [(756259200000000.0, 5, "2023-12-19T00:00:00Z")]


@pytest.mark.parametrize("spec,bad", [
    ({"a": {"avg": {"field": "not_valid"}}}, "not_valid"),
    ({"h": {"date_histogram": {"field": "not_valid",
                               "fixed_interval": "30d"}}}, "not_valid"),
    ({"t": {"terms": {"field": "nonexistent_column"}}},
     "nonexistent_column"),
    ({"r": {"range": {"field": "invalid_field",
                      "ranges": [{"to": 3}, {"from": 3}]}}},
     "invalid_field"),
    ({"t": {"terms": {"field": "rating"},
            "aggs": {"avg_invalid": {"avg": {"field": "bad_field"}}}}},
     "bad_field"),
    ({"t": {"terms": {"field": "rating"},
            "aggs": {"nested": {"terms": {"field": "also_invalid"}}}}},
     "also_invalid"),
])
def test_5_to_11_invalid_fields_error(idx, spec, bad):
    import re
    with pytest.raises(Exception, match=re.escape(ERR.format(bad))):
        _agg(idx, spec)


def test_12_valid_nested(idx):
    env = _agg(idx, {"t": {"terms": {"field": "rating"},
                           "aggs": {"avg_rating":
                                    {"avg": {"field": "rating"}}}}})["t"]
    assert sorted((b["key"], b["doc_count"], b["avg_rating"]["value"])
                  for b in env["buckets"]) == \
        [(3, 1, 3.0), (4, 2, 4.0), (5, 2, 5.0)]


def test_16_to_19_datetime_metrics_key_as_string(idx):
    want = {
        "min": (757418400000000.0, "2024-01-01T10:00:00Z"),
        "max": (757778400000000.0, "2024-01-05T14:00:00Z"),
        "avg": (757598400000000.0, "2024-01-03T12:00:00Z"),
        "sum": (3787992000000000.0, "2120-01-14T12:00:00Z"),
    }
    for kind, (value, iso) in want.items():
        got = _agg(idx, {"m": {kind: {"field": "created_at"}}})["m"]
        assert got == {"value": value, "key_as_string": iso}, kind


def test_20_non_datetime_metric_no_key_as_string(idx):
    got = _agg(idx, {"m": {"min": {"field": "rating"}}})["m"]
    assert got == {"value": 3.0} or got == {"value": 3}
