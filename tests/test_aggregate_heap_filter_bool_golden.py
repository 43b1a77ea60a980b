"""aggregate_heap_filter_bool.out + aggregate_scan_expressions.out
goldens (PUBLIC reference behavior): bare-boolean heap filters under
aggregate scans (`AND flag` / `AND flag = false` / `AND NOT flag`) and
GROUP BY over a lower() expression with a per-group pdb.agg envelope,
ordered DESC with LIMIT/OFFSET.

Ref: pg_search/tests/pg_regress/expected/aggregate_heap_filter_bool.out
     pg_search/tests/pg_regress/expected/aggregate_scan_expressions.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def flags(spark):
    docs = spark.createDataFrame(
        [(g, ["a", "b"][g % 2], g % 2 == 0) for g in range(1, 501)],
        "id int, category string, flag boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", tokenizer="keyword")]))
    return docs, idx


def _count(flags, extra):
    docs, idx = flags
    m = compile_query(idx, ast.Term("category", "a")).select("doc_id")
    return (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
            .filter(extra).count())


def test_bare_boolean_heap_filter(flags):
    """category === 'a' (ids with g%2==0 → flag true) AND flag."""
    assert _count(flags, F.col("flag")) == 250


def test_boolean_equals_false(flags):
    assert _count(flags, F.col("flag") == False) == 0  # noqa: E712


def test_not_boolean(flags):
    assert _count(flags, ~F.col("flag")) == 0


def test_group_by_lower_expression_with_agg(spark):
    # reference indexes the EXPRESSION (lower(record_type)::pdb.literal)
    # and groups by its fast field, so the bucket keys come back lowered
    docs = spark.createDataFrame(
        [(1, "Type1", 1), (2, "Type2", 2)],
        "id int, record_type string, dwf_doid int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="lower_record_type",
                                 source="lower(record_type)",
                                 tokenizer="keyword", lowercase=False)]))
    m = compile_query(idx, ast.All()).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .groupBy(F.lower("record_type").alias("lower"))
           .agg(F.count("dwf_doid").cast("double").alias("count"))
           .orderBy(F.col("lower").desc()).limit(100).collect())
    assert [(r["lower"], r["count"]) for r in got] == \
        [("type2", 1.0), ("type1", 1.0)]
    # same shape through the ES envelope: terms over the expression
    # field resolves via its schema source (no physical column)
    env = search_aggregate(idx, ast.All(), {
        "g": {"terms": {"field": "lower_record_type"},
              "aggs": {"c": {"value_count": {"field": "dwf_doid"}}}}})
    got2 = sorted((b["key"], b["c"]["value"])
                  for b in env["aggregations"]["g"]["buckets"])
    assert got2 == [("type1", 1.0), ("type2", 1.0)]
