"""custom_scan_with_subquery.out golden (PUBLIC reference behavior,
table replicated inline): a keyset cursor built from scalar subqueries
over typed fast fields (uuid equality, boolean, date range, IS NULL)
— a missing cursor row (col_a=999) makes every subquery NULL and the
page empty; the real cursor (col_a=100) pages to rows 101, 99.

Ref: pg_search/tests/pg_regress/expected/custom_scan_with_subquery.out
"""

import datetime

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

UUID1 = "11111111-1111-1111-1111-111111111111"


@pytest.fixture(scope="module")
def t(spark):
    rows = [
        (100, UUID1, True, datetime.date(2025, 8, 1),
         datetime.datetime(2025, 8, 1, 10, 0, 0), None),
        (99, UUID1, True, datetime.date(2025, 7, 31),
         datetime.datetime(2025, 7, 31, 9, 0, 0), None),
        (101, UUID1, True, datetime.date(2025, 8, 1),
         datetime.datetime(2025, 8, 1, 9, 30, 0), None),
    ]
    docs = spark.createDataFrame(
        rows, "col_a long, col_b string, col_c boolean, col_d date, "
              "col_e timestamp, col_f timestamp")
    idx = build_index(docs, IndexSchema(
        key_field="col_a",
        text_fields=[FieldConfig(name="col_b", field_type="uuid")]))
    return idx, docs


def _page(idx, docs, cursor_key: int):
    m = compile_query(idx, ast.All()).select("doc_id")
    d = docs.join(m, docs["col_a"] == m["doc_id"], "left_semi")
    base = (d.filter((F.col("col_b") == UUID1) & F.col("col_c")
                     & (F.col("col_d") >= "2025-07-01")
                     & (F.col("col_d") <= "2025-08-31")
                     & F.col("col_f").isNull()))
    cur = (docs.filter(F.col("col_a") == cursor_key)
           .select(F.col("col_d").alias("cd"),
                   F.col("col_e").alias("ce")))
    # a missing cursor row -> empty broadcast side -> empty page (the
    # SQL NULL-subquery semantics: NULL comparisons are never true)
    page = (base.crossJoin(F.broadcast(cur))
            .filter((F.col("col_d") <= F.col("cd"))
                    & ((F.col("col_d") < F.col("cd"))
                       | ((F.col("col_e") < F.col("ce"))
                          & (F.col("col_d") == F.col("cd")))
                       | ((F.col("col_a") < 100)
                          & (F.col("col_d") == F.col("cd"))
                          & (F.col("col_e") == F.col("ce")))))
            .orderBy(F.col("col_d").desc(), F.col("col_e").desc(),
                     F.col("col_a").desc())
            .limit(10))
    return [r["col_a"] for r in page.select("col_a").collect()]


def test_missing_cursor_row_empty_page(t):
    idx, docs = t
    assert _page(idx, docs, 999) == []


def test_real_cursor_pages(t):
    idx, docs = t
    assert _page(idx, docs, 100) == [101, 99]
