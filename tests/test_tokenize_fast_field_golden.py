"""tokenize_fast_field.out golden (PUBLIC reference behavior): the
``columnar=true`` option adds a RAW fast column beside a word-tokenized
field, so ORDER BY description rides the TopK scan (no check_topk_scan
warning even though the tokenizer splits words) and GROUP BY
description answers from the ordered terms prefix.

Ref: pg_search/tests/pg_regress/expected/tokenize_fast_field.out
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.fixtures import mock_items
from sparksearch.query import ast, search

WANT = [(25, "Anti-aging serum"), (19, "Artistic ceramic vase"),
        (32, "Bluetooth-enabled speaker"), (24, "Classic leather sofa"),
        (10, "Colorful kids toy")]


@pytest.fixture(scope="module")
def columnar_idx(spark):
    docs = mock_items(spark)
    # columnar=true analog: the field keeps its word tokenizer AND
    # stays fast (FieldConfig.fast default) — its raw column serves sorts
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="simple",
                                 fast=True)]))


def test_order_by_tokenized_fast_field_no_warning(columnar_idx):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = search(columnar_idx, ast.All(), limit=5,
                      order_by=[("description", "asc")],
                      columns=["id", "description"],
                      with_score=False).collect()
    assert [(r[0], r[1]) for r in rows] == WANT


def test_group_by_description_ordered_prefix(columnar_idx):
    res = search_aggregate(columnar_idx, ast.All(), {
        "g": {"terms": {"field": "description", "size": 5,
                        "order": {"_key": "asc"}}}})
    got = [(b["key"], b["doc_count"])
           for b in res["aggregations"]["g"]["buckets"]]
    assert got == [(d, 1) for _, d in WANT]
