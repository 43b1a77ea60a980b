"""issue_4529.out golden (PUBLIC reference behavior): DISTINCT over a
search-driven join with a typmod literal_normalized fast field —
``SELECT DISTINCT s.name FROM products p JOIN suppliers s ON
p.supplier_id = s.id WHERE p.description === 'widget' ORDER BY s.name
LIMIT 10`` → 'Alpha'.  The #3978 safety half: when only
``lower(name)`` is indexed (an expression that TRANSFORMS the value),
the raw column must not be served from the expression's fast data —
the engine reads display columns from the doc table, so the result
keeps original case, and the ORDER-BY pushability check flags the sort
key as unpushable (the JoinScan-not-used warning analog).

Ref: pg_search/tests/pg_regress/expected/issue_4529.out
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.search import search

SUPPLIERS = [(1, "Alpha"), (2, "Beta")]
PRODUCTS = [(1, "Widget", "A fine widget", 1),
            (2, "Gadget", "A cool gadget", 1),
            (3, "Gizmo", "A neat gizmo", 2)]


def _tables(spark):
    s = spark.createDataFrame(SUPPLIERS, "id long, name string")
    p = spark.createDataFrame(
        PRODUCTS, "id long, name string, description string, "
                  "supplier_id long")
    return s, p


def _distinct_join(spark, p_idx, s, p):
    m = compile_query(p_idx, ast.Term("description", "widget")) \
        .select("doc_id")
    hits = p.join(m, p["id"] == m["doc_id"], "left_semi")
    return (hits.join(s.select(F.col("id").alias("sid"),
                               F.col("name").alias("sname")),
                      hits["supplier_id"] == F.col("sid"))
            .select("sname").distinct()
            .orderBy("sname").limit(10).collect())


def test_distinct_join_over_fast_literal_field(spark):
    s, p = _tables(spark)
    p_idx = build_index(p, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name",
                                 tokenizer="literal_normalized"),
                     FieldConfig(name="description")],
        numeric_fields=["supplier_id"]))
    got = _distinct_join(spark, p_idx, s, p)
    assert [r["sname"] for r in got] == ["Alpha"]


def test_expression_index_never_serves_raw_column(spark):
    """Only lower(name) is indexed; the raw column must come back with
    ORIGINAL case ('Alpha', never 'alpha')."""
    s, p = _tables(spark)
    p_idx = build_index(p, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name_lower",
                                 source="lower(name)",
                                 tokenizer="literal"),
                     FieldConfig(name="description")],
        numeric_fields=["supplier_id"]))
    got = _distinct_join(spark, p_idx, s, p)
    assert [r["sname"] for r in got] == ["Alpha"]

    # the pushability check knows lower(name) ≠ name: ORDER BY the raw
    # string column with LIMIT warns (check_topk_scan analog of the
    # golden's "DISTINCT columns must be fast fields" JoinScan bailout)
    with pytest.warns(UserWarning, match=r"not using Top K scan"):
        search(p_idx, ast.Term("description", "widget"), limit=10,
               order_by=[("name", "asc")]).collect()
    # ...while ORDER BY the indexed expression itself is pushable
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        search(p_idx, ast.Term("description", "widget"), limit=10,
               order_by=[("lower(name)", "asc")]).collect()
