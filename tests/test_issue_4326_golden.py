"""issue_4326.out golden (PUBLIC reference behavior): a TopK page over
a UUID-keyed table — ``WHERE col_uuid_1 = X AND col_bool_1 = TRUE AND
1 = 1 AND id @@@ pdb.all() ORDER BY col_ts_1 DESC, id DESC LIMIT 25``
— combined with ``pdb.agg('{"value_count": {"field": "id"}}') OVER ()``
returns the single matching row and the window aggregate ``{"value":
1.0}``.  The plan the golden pins (TopKScanExecState, Tantivy boolean
must [bool term, all, uuid term]) is the engine's Boolean(must=[...])
→ order_by TopK → match-set aggregate shape.

Ref: pg_search/tests/pg_regress/expected/issue_4326.out
"""

import datetime as dt

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.search import search

U1 = "00000000-0000-0000-0000-000000000001"
U2 = "00000000-0000-0000-0000-000000000002"
ROWS = [
    (U1, U1, dt.datetime(2024, 1, 1, 10, 0, 0), True),
    (U2, U2, dt.datetime(2024, 1, 1, 10, 1, 0), False),
]


@pytest.fixture(scope="module")
def t4326(spark):
    docs = spark.createDataFrame(
        ROWS, "id string, col_uuid_1 string, col_ts_1 timestamp, "
              "col_bool_1 boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="id", field_type="uuid"),
            FieldConfig(name="col_uuid_1", field_type="uuid"),
            FieldConfig(name="col_ts_1", tokenizer="datetime")],
        boolean_fields=["col_bool_1"]))
    return idx


Q = ast.Boolean(must=[ast.Term("col_bool_1", True),
                      ast.All(),
                      ast.Term("col_uuid_1", U1)])


def test_topk_page(t4326):
    rows = search(t4326, Q, limit=25,
                  order_by=[("col_ts_1", "desc"), ("id", "desc")],
                  with_score=False).collect()
    assert [(r["id"], r["col_uuid_1"], r["col_ts_1"], r["col_bool_1"])
            for r in rows] == [ROWS[0]]


def test_window_value_count_agg(t4326):
    res = search_aggregate(t4326, Q,
                           {"agg": {"value_count": {"field": "id"}}})
    assert res["aggregations"]["agg"] == {"value": 1.0}


def test_uuid_filter_selects_other_row(t4326):
    q = ast.Boolean(must=[ast.All(), ast.Term("col_uuid_1", U2)])
    rows = search(t4326, q, limit=25,
                  order_by=[("col_ts_1", "desc"), ("id", "desc")],
                  with_score=False).collect()
    assert [r["id"] for r in rows] == [U2]
    # the bool=TRUE conjunct excludes it again
    rows = search(t4326, ast.Boolean(
        must=[ast.Term("col_bool_1", True), ast.All(),
              ast.Term("col_uuid_1", U2)]), limit=25,
        with_score=False).collect()
    assert rows == []
