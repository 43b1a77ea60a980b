"""topk-indexed-expressions.out + tokenizer_literal_normalized.out
goldens (PUBLIC reference behavior).

- topk-indexed-expressions (issue #3303): ``ORDER BY <expr> LIMIT N``
  rides the TopK scan when <expr> is an indexed literal expression —
  upper(description), trim(description), lower(description) — not just
  hardcoded patterns; an expression NOT in the index warns and falls
  back (same rows through the Sort plan).
- tokenizer_literal_normalized: the three tokenizer choices over one
  text column — unicode_words (tokenized → neither groupable nor ORDER
  BY-pushable, both warnings), literal_normalized and literal (raw
  value stored → grouped agg rides the aggregate scan, ORDER BY rides
  TopK); the grouped value_count over two identical rows is one bucket
  of 2.

Ref: pg_search/tests/pg_regress/expected/{topk-indexed-expressions,
tokenizer_literal_normalized}.out
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import check_grouping_columns, search_aggregate
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.search import search

WANT = [("Plastic Keyboard", 4), ("Innovative wireless earbuds", 5),
        ("Fast charging power bank", 4), ("Ergonomic metal keyboard", 4),
        ("Bluetooth-enabled speaker", 3)]


def _electronics_page(idx, expr):
    got = search(idx, ast.Term("category", "electronics"), limit=5,
                 order_by=[(expr, "desc")],
                 columns=["description", "rating"],
                 with_score=False).collect()
    return [(r["description"], r["rating"]) for r in got]


@pytest.mark.parametrize("fn", ["upper", "trim", "lower"])
def test_indexed_expression_rides_topk(spark, fn):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="category"),
            FieldConfig(name="desc_expr", source=f"{fn}(description)",
                        tokenizer="literal")],
        numeric_fields=["rating"]))
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # pushable → NO topk warning
        got = _electronics_page(idx, f"{fn}(description)")
    assert got == WANT


def test_unindexed_expression_warns_and_falls_back(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")],
        numeric_fields=["rating"]))
    with pytest.warns(UserWarning, match=r"not using Top K scan"):
        got = search(idx, ast.Term("description", "shoes"), limit=5,
                     order_by=[("upper(description)", "desc")],
                     columns=["description"], with_score=False).collect()
    # the Sort fallback still returns correct order
    assert [r["description"] for r in got] == \
        ["White jogging shoes", "Sleek running shoes", "Generic shoes"]


# --- tokenizer_literal_normalized.out ----------------------------------------

ROWS2 = [(1, "Hello, world!"), (2, "Hello, world!")]


def _txt_idx(spark, tokenizer, filters=None):
    docs = spark.createDataFrame(ROWS2, "id long, text string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="text", tokenizer=tokenizer,
                                 filters=filters)]))


def test_unicode_words_neither_groupable_nor_pushable(spark):
    idx = _txt_idx(spark, "unicode_words", filters=["ascii_folding"])
    with pytest.warns(UserWarning,
                      match=r"grouping column text exists, but is not "
                            r"a fast field"):
        assert not check_grouping_columns(idx, ["text"])
    with pytest.warns(UserWarning, match=r"not using Top K scan"):
        search(idx, ast.All(), limit=5,
               order_by=[("text", "asc")]).collect()


@pytest.mark.parametrize("tok", ["literal_normalized", "literal"])
def test_literal_family_groupable_and_pushable(spark, tok):
    idx = _txt_idx(spark, tok)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert check_grouping_columns(idx, ["text"])
        page = search(idx, ast.All(), limit=5,
                      order_by=[("text", "asc")],
                      columns=["id", "text"], with_score=False).collect()
    assert [r["id"] for r in page] == [1, 2]
    # GROUP BY text + value_count(id): one bucket, count 2
    res = search_aggregate(idx, ast.All(),
                           {"g": {"terms": {"field": "text",
                                            "order": {"_key": "asc"}},
                                  "aggs": {"0": {"value_count":
                                                 {"field": "id"}}}}})
    b = res["aggregations"]["g"]["buckets"]
    assert len(b) == 1 and b[0]["doc_count"] == 2
    assert b[0]["0"] == {"value": 2.0}