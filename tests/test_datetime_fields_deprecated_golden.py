"""datetime_fields_deprecated.out golden (PUBLIC reference behavior):
the pre-v0.24.1 ``datetime_fields`` WITH option must replay cleanly —
a deprecation WARNING with the reference's exact text, never an error —
and the index behaves exactly as if the option were absent (range
query-string over the timestamp, TopK by timestamp DESC).

Ref: pg_search/tests/pg_regress/expected/datetime_fields_deprecated.out
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, dt.datetime(2024, 1, 1, 10), dt.datetime(2024, 1, 1, 10)),
    (2, dt.datetime(2024, 1, 2, 11), dt.datetime(2024, 1, 2, 11)),
    (3, dt.datetime(2024, 1, 3, 12), dt.datetime(2024, 1, 3, 12)),
]


@pytest.fixture(scope="module")
def deprecated_dt(spark):
    docs = spark.createDataFrame(
        ROWS, "id long, ts timestamp, tstz timestamp")
    schema = IndexSchema(
        key_field="id", text_fields=[],
        datetime_fields={"ts": {"fast": True}, "tstz": {"fast": True}})
    with pytest.warns(DeprecationWarning,
                      match='"datetime_fields" is deprecated'):
        idx = build_index(docs, schema)
    return docs, idx


def test_index_works_despite_option(deprecated_dt):
    docs, idx = deprecated_dt
    got = compile_query(idx, ast.All()).count()
    assert got == 3


def test_datetime_range_query(deprecated_dt):
    docs, idx = deprecated_dt
    q = ast.Range("ts", lower=dt.datetime(2024, 1, 2),
                  upper=dt.datetime(2024, 1, 3))
    m = compile_query(idx, q).select("doc_id")
    assert [r["doc_id"] for r in m.orderBy("doc_id").collect()] == [2]


def test_topk_by_timestamp_desc(deprecated_dt):
    docs, idx = deprecated_dt
    m = compile_query(idx, ast.All()).select("doc_id")
    got = (docs.join(m, docs["id"] == F.col("doc_id"), "left_semi")
           .orderBy(F.col("tstz").desc()).limit(2)
           .select("id").collect())
    assert [r["id"] for r in got] == [3, 2]
