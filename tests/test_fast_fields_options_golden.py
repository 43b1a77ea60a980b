"""fast_fields_options.out golden (PUBLIC reference behavior, table
replicated inline): how the per-field ``fast`` option steers the
ORDER BY + LIMIT executor choice — surfaced here, as in the reference,
through the check_topk_scan planner warning:

- index WITHOUT explicit fast on non-text fields: numeric / boolean /
  timestamp ORDER BY rides TopK silently (fast by default), a
  default-tokenized text column warns, a RANGE (composite) column
  always warns (the reference's issue #2688);
- index WITH ``{"fast": true}`` everywhere: same matrix — explicit
  true adds nothing, ranges still warn;
- index WITH ``{"fast": false}`` on numeric/boolean/range fields:
  their ORDER BY now warns too (Test 6 — the fast data was dropped);
- ORDER BY with NO LIMIT never warns (columnar/normal exec, Tests
  3/5/7).

Ref: pg_search/tests/pg_regress/expected/fast_fields_options.out
     pg_search/tests/pg_regress/sql/fast_fields_options.sql
"""

import datetime
import warnings

import pytest
from pyspark.sql import Row

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.search import search

CATS = ["Home", "Clothing", "Books", "Electronics"]  # i%4 = 3,1,2,0


def _rows():
    base = datetime.datetime(2023, 1, 1)
    out = []
    for i in range(1, 1001):
        day = base + datetime.timedelta(days=i % 365)
        out.append(Row(
            id=i, title=f"Product {i}",
            category={0: "Electronics", 1: "Clothing",
                      2: "Books"}.get(i % 4, "Home"),
            price=float((i * 37) % 1000) + 0.5,
            in_stock=i % 3 == 0,
            created_at=day,
            valid_period=Row(lower=day,
                             upper=day + datetime.timedelta(days=30)),
            quantity_range=Row(lower=(i % 10) * 10,
                               upper=(i % 10 + 1) * 10),
            tags=[f"tag{i % 5}", f"tag{i % 7}", f"tag{i % 3}"]))
    return out


def _index(spark, numeric_fields, boolean_fields):
    docs = spark.createDataFrame(_rows())
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="title", tokenizer="default"),
            FieldConfig(name="category", tokenizer="keyword", fast=True),
            FieldConfig(name="tags", tokenizer="keyword", fast=True)],
        numeric_fields=numeric_fields, boolean_fields=boolean_fields))
    idx.table_name = "data_records"
    return idx


@pytest.fixture(scope="module")
def no_fast_idx(spark):
    # numeric_fields = '{"price":{}}' etc. — no explicit fast
    return _index(spark, ["price"], ["in_stock"])


@pytest.fixture(scope="module")
def fast_true_idx(spark):
    return _index(spark, [{"name": "price", "fast": True}],
                  [{"name": "in_stock", "fast": True}])


@pytest.fixture(scope="module")
def fast_false_idx(spark):
    return _index(spark, [{"name": "price", "fast": False}],
                  [{"name": "in_stock", "fast": False}])


QUERY = ast.Parse("product", field="title")
WARN_HEAD = ("Query has LIMIT 10 but is not using Top K scan (using "
             "Normal instead). Reason: ORDER BY columns cannot be "
             "pushed down to the index.")


def _order(idx, col, limit=10):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = search(idx, QUERY, limit=limit,
                      order_by=[(col, "asc")],
                      columns=["id", "title", "category"],
                      with_score=False).collect()
    warned = any(str(x.message).startswith(WARN_HEAD) for x in w)
    return rows, warned


# --- index WITHOUT explicit fast on non-text fields --------------------------

@pytest.mark.parametrize("col,warns", [
    ("title", True),          # Test 1: default-tokenized text → Normal
    ("id", False),            # Test 2: key / numerics ride TopK
    ("category", False),      # keyword + fast:true text
    ("price", False),
    ("in_stock", False),
    ("valid_period", True),   # composite range — issue #2688
    ("created_at", False),
])
def test_default_fast_matrix(no_fast_idx, col, warns):
    rows, warned = _order(no_fast_idx, col)
    assert warned == warns, col
    assert len(rows) == 10


def test_order_without_limit_never_warns(no_fast_idx):
    # Test 3: no LIMIT → columnar exec, no TopK check at all
    rows, warned = _order(no_fast_idx, "id", limit=None)
    assert not warned
    assert [r.id for r in rows[:5]] == [1, 2, 3, 4, 5]
    assert len(rows) == 1000


# --- index WITH explicit fast:true --------------------------------------------

@pytest.mark.parametrize("col,warns", [
    ("price", False),
    ("in_stock", False),
    ("valid_period", True),   # fast:true cannot rescue a composite
    ("created_at", False),
])
def test_explicit_fast_true_matrix(fast_true_idx, col, warns):
    rows, warned = _order(fast_true_idx, col)
    assert warned == warns, col
    assert len(rows) == 10


# --- index WITH explicit fast:false -------------------------------------------

@pytest.mark.parametrize("col,warns", [
    ("price", True),          # Test 6: fast data dropped → Normal+Sort
    ("in_stock", True),
    ("valid_period", True),
])
def test_explicit_fast_false_matrix(fast_false_idx, col, warns):
    rows, warned = _order(fast_false_idx, col)
    assert warned == warns, col
    assert len(rows) == 10


def test_fast_false_rows_still_correct(fast_false_idx):
    # degraded plan, identical rows: lowest 10 prices among matches
    rows, _ = _order(fast_false_idx, "price")
    prices = [float((r.id * 37) % 1000) + 0.5 for r in rows]
    assert prices == sorted(prices)


def test_no_limit_columnar_never_warns_fast_false(fast_false_idx):
    # Test 7: ORDER BY id with no LIMIT — no warning even at fast:false
    rows, warned = _order(fast_false_idx, "id", limit=None)
    assert not warned and len(rows) == 1000
