"""Sorted-index NULL/zero and precision semantics — rust-suite parity
(PUBLIC reference behavior, corpora replicated inline from
tests/tests/index_sorting.rs): a ``sort_by`` index must keep SQL NULL
distinct from 0 in ORDER BY results (the reference regression was
Tantivy assigning missing docs sort key 0 so NULLs interleaved with
real zeros), across MULTIPLE segments (streamed inserts), and sort
BIGINT values above 2^24 exactly (never through an f32 sort key:
16777216 and 16777217 are identical as f32).

The doc column is literally named ``score`` — also pins that a user
column named ``score`` coexists with the engine's score projection
(with_score=False path).

Ref: tests/tests/index_sorting.rs:875-1391
(index_sort_by_null_handling, index_sort_by_null_and_zero_interleaving,
 .._multi_segment_asc, .._multi_segment_desc,
 index_sort_by_f32_precision_above_2_24)
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.search import search

_SCHEMA_DDL = "id long, content string, score int"


def _schema(sort_by):
    return IndexSchema(key_field="id",
                       text_fields=[FieldConfig(name="content")],
                       numeric_fields=["score"],
                       sort_by=sort_by)


def _scores(idx, direction):
    rows = search(idx, ast.Parse("Item", field="content"),
                  order_by=[("score", direction)],
                  columns=["id", "score"], with_score=False).collect()
    return [r["score"] for r in rows]


def test_null_zero_interleaving_single_segment(spark):
    docs = spark.createDataFrame(
        [(1, "Item A", None), (2, "Item B", 0), (3, "Item C", None),
         (4, "Item D", 0), (5, "Item E", 1), (6, "Item F", None),
         (7, "Item G", 5)], _SCHEMA_DDL)
    idx = build_index(docs, _schema("score ASC NULLS FIRST"))
    assert _scores(idx, "asc nulls first") == [None, None, None, 0, 0, 1, 5]


def test_null_handling_two_segments_desc(spark, tmp_path):
    from sparksearch.index import build_and_save
    from sparksearch.streaming.indexer import (insert_docs,
                                               open_segmented_index)
    schema = _schema("score DESC NULLS LAST")
    seg1 = spark.createDataFrame(
        [(1, "Item A", 100), (2, "Item B", None), (3, "Item C", 50),
         (4, "Item D", None), (5, "Item E", 75)], _SCHEMA_DDL)
    seg2 = spark.createDataFrame(
        [(6, "Item F", 25), (7, "Item G", None), (8, "Item H", 90)],
        _SCHEMA_DDL)
    path = str(tmp_path / "nullsort")
    build_and_save(seg1, schema, path, segmented=True)
    insert_docs(spark, path, seg2, schema)
    idx = open_segmented_index(spark, path, schema,
                               docs=seg1.unionByName(seg2))
    got = _scores(idx, "desc nulls last")
    assert got == [100, 90, 75, 50, 25, None, None, None]


@pytest.mark.parametrize("direction,want", [
    ("asc nulls first", [None, None, None, 0, 0, 1]),
    ("desc nulls last", [1, 0, 0, None, None, None]),
], ids=["asc_nulls_first", "desc_nulls_last"])
def test_null_zero_three_segments(spark, tmp_path, direction, want):
    # PR #106 regression shape: NULLs and zeros split across 3 segments
    # so the cross-segment merge must keep NULL ≠ 0
    from sparksearch.index import build_and_save
    from sparksearch.streaming.indexer import (insert_docs,
                                               open_segmented_index)
    schema = _schema(f"score {direction.upper()}")
    segs = [
        [(1, "Item A", None), (2, "Item B", 0)],
        [(3, "Item C", None), (4, "Item D", 0)],
        [(5, "Item E", None), (6, "Item F", 1)],
    ]
    path = str(tmp_path / f"nz_{direction.split()[0]}")
    dfs = [spark.createDataFrame(s, _SCHEMA_DDL) for s in segs]
    build_and_save(dfs[0], schema, path, segmented=True)
    for d in dfs[1:]:
        insert_docs(spark, path, d, schema)
    all_docs = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
    idx = open_segmented_index(spark, path, schema, docs=all_docs)
    assert _scores(idx, direction) == want


def test_bigint_sort_above_f32_precision(spark):
    docs = spark.createDataFrame(
        [(1, "item", 16777217), (2, "item", 16777216)],
        "id long, content string, val long")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")],
        numeric_fields=["val"], sort_by="val ASC NULLS FIRST"))
    rows = search(idx, ast.Parse("item", field="content"),
                  order_by=[("val", "asc")],
                  columns=["id", "val"], with_score=False).collect()
    assert [r["val"] for r in rows] == [16777216, 16777217]
