"""custom-agg.out golden (PUBLIC reference behavior, logs table
replicated inline): pdb.agg() across its surface — GROUP BY'd custom
aggs (terms/range/avg per SQL group), window (OVER ()) envelopes on a
TopK page, FILTER clauses, boolean WHERE shapes incl. contradictions
and tautologies, empty match sets, multiple aggs in one select, the
gap-filled histogram (tantivy min_doc_count=0 emits every bucket
between min and max), and the fail-fast error strings for malformed
agg JSON.

Ref: pg_search/tests/pg_regress/expected/custom-agg.out
"""

import datetime as dt
import re

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.search import search_with_facets

T0 = dt.datetime(2024, 1, 1, 10, 0)


def _t(m):
    return T0 + dt.timedelta(minutes=m)


LOGS = [
    (1, "Database connection error", "error", "database", 150, 500, _t(0)),
    (2, "Invalid query syntax error", "error", "database", 50, 400, _t(3)),
    (3, "Database timeout error", "critical", "database", 3000, 503,
     _t(5)),
    (4, "Database deadlock detected", "error", "database", 200, 500,
     _t(10)),
    (5, "Database connection pool exhausted", "critical", "database",
     5000, 503, _t(15)),
    (6, "Slow database query", "warning", "database", 2500, 200, _t(20)),
    (7, "Failed to fetch data", "error", "api", 200, 404, _t(1)),
    (8, "API rate limit exceeded", "warning", "api", 100, 429, _t(6)),
    (9, "API authentication failed", "error", "api", 80, 401, _t(11)),
    (10, "API endpoint not found", "error", "api", 50, 404, _t(16)),
    (11, "API internal server error", "critical", "api", 1500, 500,
     _t(21)),
    (12, "Timeout connecting to service", "error", "network", 5000, 503,
     _t(2)),
    (13, "Network connection refused", "error", "network", 100, 503,
     _t(7)),
    (14, "DNS resolution failed", "error", "network", 30, 503, _t(12)),
    (15, "Network timeout error", "critical", "network", 10000, 504,
     _t(17)),
    (16, "Application crashed", "critical", "application", 0, 500, _t(4)),
    (17, "Memory allocation error", "critical", "application", 10, 500,
     _t(8)),
    (18, "Null pointer exception", "error", "application", 5, 500,
     _t(13)),
    (19, "Stack overflow error", "critical", "application", 2, 500,
     _t(18)),
    (20, "Unauthorized access attempt", "warning", "security", 20, 403,
     _t(9)),
    (21, "Invalid authentication token", "error", "security", 15, 401,
     _t(14)),
    (22, "Suspicious activity detected", "critical", "security", 25, 403,
     _t(19)),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        LOGS, "id int, description string, severity string, "
        "category string, response_time int, status_code int, "
        "timestamp timestamp")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="severity"),
                     FieldConfig(name="category")]))


ERROR_Q = ast.Parse("error", field="description")


def _agg(idx, q, spec):
    return search_aggregate(idx, q, spec)["aggregations"]


def _grouped(idx, q, spec):
    env = _agg(idx, q, {"g": {"terms": {"field": "category",
                                        "size": 65000},
                              "aggs": {"a": spec}}})
    return {b["key"]: b["a"] for b in env["g"]["buckets"]}


def _tset(env):
    return sorted((b["key"], b["doc_count"]) for b in env["buckets"])


def test_1_group_by_with_terms_agg(idx):
    got = _grouped(idx, ERROR_Q, {"terms": {"field": "severity"}})
    assert {k: _tset(v) for k, v in got.items()} == {
        "database": [("critical", 1), ("error", 2)],
        "application": [("critical", 2)],
        "api": [("critical", 1)],
        "network": [("critical", 1)]}
    for env in got.values():
        assert env["sum_other_doc_count"] == 0
        assert env["doc_count_error_upper_bound"] == 0


def test_2_window_agg_over_topk_page(idx):
    page = search_with_facets(
        idx, ERROR_Q, limit=10,
        order_by=[("timestamp", "desc")],
        facets={"agg": {"avg": {"field": "response_time"}}})
    assert [h["id"] for h in page["hits"]] == [11, 19, 15, 17, 3, 2, 1]
    assert page["facets"]["agg"] == {"value": 2101.714285714286}


def test_3_mixed_standard_and_custom(idx):
    env = _agg(idx, ERROR_Q,
               {"g": {"terms": {"field": "category", "size": 65000},
                      "aggs": {"sev": {"terms": {"field": "severity"}}}}})
    counts = {b["key"]: b["doc_count"] for b in env["g"]["buckets"]}
    assert counts == {"database": 3, "application": 2, "api": 1,
                      "network": 1}


def test_4_agg_with_filter_clause(idx):
    """FILTER (WHERE status_code >= 500) narrows the agg's match set."""
    q = ast.Boolean(must=[ERROR_Q,
                          ast.Range("status_code", lower=500,
                                    lower_inclusive=True)])
    got = _agg(idx, q, {"a": {"avg": {"field": "response_time"}}})["a"]
    assert got == {"value": 2443.6666666666665}


def test_9_buckets_wrapper_rejected(idx):
    with pytest.raises(Exception, match=re.escape(
            "pdb.agg() received JSON with 'buckets' key")):
        _agg(idx, ERROR_Q,
             {"a": {"buckets": {"terms": {"field": "category"}}}})


def test_10_non_object_rejected(idx):
    with pytest.raises(Exception, match=re.escape(
            "pdb.agg() expects a JSON object")):
        _agg(idx, ERROR_Q, {"a": "invalid"})


def test_11_unknown_agg_type_rejected(idx):
    with pytest.raises(Exception, match=re.escape(
            "unknown variant `invalid_agg_type`, expected one of "
            "`range`, `histogram`, `date_histogram`, `terms`, `filter`, "
            "`composite`, `avg`, `value_count`, `max`, `min`, `stats`, "
            "`extended_stats`, `sum`, `percentiles`, `top_hits`, "
            "`cardinality`")):
        _agg(idx, ERROR_Q,
             {"a": {"invalid_agg_type": {"field": "category"}}})


def test_13_range_agg_per_group(idx):
    got = _grouped(idx, ERROR_Q, {"range": {
        "field": "response_time",
        "ranges": [{"to": 100}, {"from": 100, "to": 1000},
                   {"from": 1000}]}})
    by_cat = {k: [(b["key"], b["doc_count"]) for b in v["buckets"]]
              for k, v in got.items()}
    assert by_cat == {
        "database": [("*-100", 1), ("100-1000", 1), ("1000-*", 1)],
        "application": [("*-100", 2), ("100-1000", 0), ("1000-*", 0)],
        "api": [("*-100", 0), ("100-1000", 0), ("1000-*", 1)],
        "network": [("*-100", 0), ("100-1000", 0), ("1000-*", 1)]}


def test_14_histogram_gap_filled(idx):
    """Tantivy emits every interval bucket between min and max: 0..10000
    at interval 100 = 101 buckets, 96 of them zero."""
    env = _agg(idx, ERROR_Q,
               {"h": {"histogram": {"field": "response_time",
                                    "interval": 100}}})["h"]
    buckets = env["buckets"]
    assert len(buckets) == 101
    assert [b["key"] for b in buckets] == [float(k * 100)
                                           for k in range(101)]
    nonzero = {b["key"]: b["doc_count"] for b in buckets
               if b["doc_count"]}
    assert nonzero == {0.0: 3, 100.0: 1, 1500.0: 1, 3000.0: 1,
                       10000.0: 1}


def test_20_multiple_aggs_one_select(idx):
    got = _agg(idx, ERROR_Q,
               {"avg_response": {"avg": {"field": "response_time"}},
                "max_status": {"max": {"field": "status_code"}}})
    assert got["avg_response"] == {"value": 2101.714285714286}
    assert got["max_status"] == {"value": 504.0}


def test_22_boolean_and_in_where(idx):
    q = ast.Boolean(must=[ERROR_Q,
                          ast.Range("status_code", lower=500,
                                    lower_inclusive=True)])
    env = _agg(idx, q, {"t": {"terms": {"field": "category"}}})["t"]
    assert [(b["key"], b["doc_count"]) for b in env["buckets"]] == [
        ("application", 2), ("database", 2), ("api", 1), ("network", 1)]


def test_23_boolean_or_in_where(idx):
    q = ast.Boolean(should=[ERROR_Q,
                            ast.Parse("timeout", field="description")])
    got = _agg(idx, q, {"a": {"avg": {"field": "response_time"}}})["a"]
    assert got == {"value": 2464.0}


def test_24_nested_boolean_where(idx):
    q = ast.Boolean(should=[
        ast.Boolean(must=[ERROR_Q,
                          ast.Range("status_code", lower=500,
                                    lower_inclusive=True)]),
        ast.Boolean(must=[ast.Parse("timeout", field="description"),
                          ast.Range("response_time", lower=1000,
                                    lower_inclusive=False)])])
    got = _grouped(idx, q, {"terms": {"field": "severity"}})
    assert {k: _tset(v) for k, v in got.items()} == {
        "application": [("critical", 2)],
        "database": [("critical", 1), ("error", 1)],
        "network": [("critical", 1), ("error", 1)],
        "api": [("critical", 1)]}


def test_25_26_no_matching_documents(idx):
    env = _agg(idx, ast.Parse("nonexistent_term_xyz",
                              field="description"),
               {"t": {"terms": {"field": "category"}}})["t"]
    assert env == {"buckets": [], "sum_other_doc_count": 0,
                   "doc_count_error_upper_bound": 0}
    grouped = _grouped(idx, ast.Parse("nonexistent_term_xyz",
                                      field="description"),
                       {"avg": {"field": "response_time"}})
    assert grouped == {}


def test_27_two_group_by_columns(idx):
    env = _agg(idx, ERROR_Q, {
        "g": {"terms": {"field": "category", "size": 65000,
                        "order": {"_key": "asc"}},
              "aggs": {"s": {"terms": {"field": "severity", "size": 65000,
                                       "order": {"_key": "asc"}},
                             "aggs": {"a": {"avg":
                                            {"field":
                                             "response_time"}}}}}}})
    flat = [(b["key"], sb["key"], sb["a"]["value"])
            for b in env["g"]["buckets"] for sb in b["s"]["buckets"]]
    assert sorted(flat) == [
        ("api", "critical", 1500.0),
        ("application", "critical", 6.0),
        ("database", "critical", 3000.0),
        ("database", "error", 100.0),
        ("network", "critical", 10000.0)]


def test_37_contradictory_where(idx):
    q = ast.Boolean(must=[ERROR_Q], must_not=[ERROR_Q])
    env = _agg(idx, q, {"t": {"terms": {"field": "category"}}})["t"]
    assert env == {"buckets": [], "sum_other_doc_count": 0,
                   "doc_count_error_upper_bound": 0}


def test_38_tautological_where(idx):
    """(x OR NOT x) ≡ all(): avg over every row."""
    got = _agg(idx, ast.All(),
               {"a": {"avg": {"field": "response_time"}}})["a"]
    assert got == {"value": 1274.409090909091}
