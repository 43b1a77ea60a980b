"""json_operator.out golden (PUBLIC reference behavior): FTS over a JSON
subpath (``metadata->>'color' @@@ 'white'``) composed with non-indexed
JSON projections in the outer predicate — numeric casts, IS [NOT] NULL,
boolean tests, IN lists — via the HeapFilter node, over the standard
mock_items corpus plus the golden's five inserted electronics rows."""

import json

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.search import search


@pytest.fixture(scope="module")
def jsonop_index(spark):
    base = mock_items(spark)
    extra = [("Computer mouse", {"price": 100, "color": "white",
                                 "in_stock": True}),
             ("Keyboard", {"price": 150, "color": "black",
                           "in_stock": False}),
             ("Monitor", {"price": 200, "color": "white", "in_stock": True}),
             ("Printer", {"price": 120, "color": "black",
                          "in_stock": False}),
             ("Speaker", {"price": 80, "color": "white", "in_stock": True})]
    start = base.count() + 1
    rows = [(start + i, d, json.dumps(m)) for i, (d, m) in enumerate(extra)]
    extra_df = base.sparkSession.createDataFrame(
        rows, "id int, description string, metadata string")
    docs = (base.select("id", "description", "metadata")
            .unionByName(extra_df))
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="metadata", tokenizer="json")]))


def _rows(idx, q, limit=5):
    out = search(idx, q, limit=limit, order_by=[("id", "asc")],
                 columns=["description", "metadata"], with_score=False)
    out = out.withColumn("color", F.get_json_object("metadata", "$.color")) \
             .withColumn("price", F.get_json_object("metadata", "$.price"))
    return [(r["description"], r["color"], r["price"])
            for r in out.collect()]


def test_json_subpath_fts_golden(jsonop_index):
    """metadata->>'color' @@@ 'white' ORDER BY id LIMIT 5: three base
    'White' rows (case preserved in the projection) then the inserted
    white electronics."""
    got = _rows(jsonop_index, ast.Term("metadata.color", "white"))
    assert [g[0] for g in got] == ["White jogging shoes",
                                   "Refreshing face wash",
                                   "Anti-aging serum",
                                   "Computer mouse", "Monitor"]
    assert got[0][1] == "White" and got[3][1] == "white"
    assert got[3][2] == "100" and got[4][2] == "200"


def test_json_fts_with_numeric_cast_filter_golden(jsonop_index):
    """... AND (metadata->>'price')::int > 100 → only Monitor."""
    q = ast.HeapFilter(
        ast.Term("metadata.color", "white"),
        "CAST(get_json_object(metadata, '$.price') AS INT) > 100")
    assert [g[0] for g in _rows(jsonop_index, q)] == ["Monitor"]


def test_json_fts_with_null_filters_golden(jsonop_index):
    """price IS NOT NULL → the three white electronics; price IS NULL →
    the three base 'White' rows."""
    not_null = ast.HeapFilter(
        ast.Term("metadata.color", "white"),
        "get_json_object(metadata, '$.price') IS NOT NULL")
    assert [g[0] for g in _rows(jsonop_index, not_null)] == [
        "Computer mouse", "Monitor", "Speaker"]
    is_null = ast.HeapFilter(
        ast.Term("metadata.color", "white"),
        "get_json_object(metadata, '$.price') IS NULL")
    assert [g[0] for g in _rows(jsonop_index, is_null)] == [
        "White jogging shoes", "Refreshing face wash", "Anti-aging serum"]


def test_json_fts_with_boolean_filter_golden(jsonop_index):
    """... AND (metadata->>'in_stock')::boolean IS TRUE."""
    q = ast.HeapFilter(
        ast.Term("metadata.color", "white"),
        "CAST(get_json_object(metadata, '$.in_stock') AS BOOLEAN) = TRUE")
    assert [g[0] for g in _rows(jsonop_index, q)] == [
        "Computer mouse", "Monitor", "Speaker"]


def test_json_projection_in_list_with_all_golden(jsonop_index):
    """metadata->>'color' IN ('white','black') AND paradedb.all() — the
    IN-list runs as a heap filter over the full index scan."""
    q = ast.HeapFilter(
        ast.All(),
        "get_json_object(metadata, '$.color') IN ('white', 'black')")
    assert [g[0] for g in _rows(jsonop_index, q)] == [
        "Computer mouse", "Keyboard", "Monitor", "Printer", "Speaker"]
    q2 = ast.HeapFilter(
        ast.All(),
        "CAST(get_json_object(metadata, '$.price') AS INT) IN (80, 100, 120)")
    assert [g[0] for g in _rows(jsonop_index, q2)] == [
        "Computer mouse", "Printer", "Speaker"]
