"""datetime_groupby_agg.out golden (PUBLIC reference behavior):
GROUP BY on a date fast field through the aggregate scan —

- Test 1: plain GROUP BY date, NULL date forms its own group,
  ORDER BY date NULLS LAST
- Test 2: the full production filter stack (text-eq heap filter,
  boolean term, IS NULL as must_not exists, != as exists + must_not
  term, BETWEEN as inclusive ranges) composed with the group-by
- Tests 3/4: exclusive date ranges below/above a pivot
- Test 5: MIN/MAX aggregates over the date field

Ref: pg_search/tests/pg_regress/expected/datetime_groupby_agg.out
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

D = dt.date


def _rows():
    vals = [
        ("org1", True, None, "account1", 100, D(2025, 12, 26), "Transaction 1a"),
        ("org1", True, None, "account1", 150, D(2025, 12, 26), "Transaction 1b"),
        ("org1", True, None, "account1", 200, D(2025, 12, 27), "Transaction 2a"),
        ("org1", True, None, "account1", 250, D(2025, 12, 27), "Transaction 2b"),
        ("org1", True, None, "account1", 275, D(2025, 12, 27), "Transaction 2c"),
        ("org1", True, None, "account1", 300, D(2025, 12, 28), "Transaction 3"),
        ("org1", True, None, "account1", 0, D(2025, 12, 29), "Zero amount"),
        ("org1", False, None, "account1", 400, D(2025, 12, 30), "Not live a"),
        ("org1", False, None, "account1", 450, D(2025, 12, 30), "Not live b"),
        ("org1", True, dt.datetime(2025, 1, 1), "account1", 500,
         D(2025, 12, 31), "Discarded"),
        ("org1", True, None, "account1", 600, None, "Null date"),
    ]
    return [(i + 1, v[0], v[1], v[2], v[3], float(v[4]), v[5], v[6])
            for i, v in enumerate(vals)]


@pytest.fixture(scope="module")
def tx_index(spark):
    df = spark.createDataFrame(
        _rows(),
        "id int, organization_id string, live_mode boolean, "
        "discarded_at timestamp, internal_account_id string, "
        "unledgered_amount double, as_of_date date, description string")
    return build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")])), df


def _grouped(idx, docs, q):
    m = compile_query(idx, q).select("doc_id")
    j = m.join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
    rows = (j.groupBy("as_of_date").agg(F.count("*").alias("count_all"))
            .orderBy(F.col("as_of_date").asc_nulls_last()).collect())
    return [(r["count_all"],
             r["as_of_date"].isoformat() if r["as_of_date"] else None)
            for r in rows]


def test_groupby_date_with_null_group(tx_index):
    idx, docs = tx_index
    got = _grouped(idx, docs, ast.All())
    assert got == [(2, "2025-12-26"), (3, "2025-12-27"), (1, "2025-12-28"),
                   (1, "2025-12-29"), (2, "2025-12-30"), (1, "2025-12-31"),
                   (1, None)]


def test_groupby_date_full_filter_stack(tx_index):
    idx, docs = tx_index
    q = ast.Boolean(must=[
        ast.Term("live_mode", True),
        ast.Boolean(must=[ast.All()],
                    must_not=[ast.Exists("discarded_at")]),
        ast.Boolean(must=[ast.Exists("unledgered_amount")],
                    must_not=[ast.Term("unledgered_amount", 0)]),
        ast.Range("as_of_date", lower=D(2025, 12, 25),
                  lower_inclusive=True),
        ast.Range("as_of_date", upper=D(2026, 2, 1),
                  upper_inclusive=True),
        ast.HeapFilter(ast.All(), "organization_id = 'org1'"),
    ])
    assert _grouped(idx, docs, q) == \
        [(2, "2025-12-26"), (3, "2025-12-27"), (1, "2025-12-28")]


def test_groupby_date_lt(tx_index):
    idx, docs = tx_index
    q = ast.Range("as_of_date", upper=D(2025, 12, 29),
                  upper_inclusive=False)
    assert _grouped(idx, docs, q) == \
        [(2, "2025-12-26"), (3, "2025-12-27"), (1, "2025-12-28")]


def test_groupby_date_gt(tx_index):
    idx, docs = tx_index
    q = ast.Range("as_of_date", lower=D(2025, 12, 28),
                  lower_inclusive=False)
    assert _grouped(idx, docs, q) == \
        [(1, "2025-12-29"), (2, "2025-12-30"), (1, "2025-12-31")]


def test_min_max_date(tx_index):
    idx, docs = tx_index
    q = ast.Term("live_mode", True)
    m = compile_query(idx, q).select("doc_id")
    j = m.join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
    r = j.agg(F.min("as_of_date").alias("min_date"),
              F.max("as_of_date").alias("max_date")).collect()[0]
    assert r["min_date"] == D(2025, 12, 26)
    assert r["max_date"] == D(2025, 12, 31)
