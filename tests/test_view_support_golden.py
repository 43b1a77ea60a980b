"""view-support.out golden (PUBLIC reference behavior, tables
replicated inline): searching through a UNION ALL view over two
independently-indexed tables — per-table searches, the view query
unioning both indexes' matches (duplicate ids across branches kept,
UNION ALL semantics), and attribute filters composing on top.

Ref: pg_search/tests/pg_regress/expected/view-support.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

P2023 = [(1, "Laptop", 1200.00, "2023-01-15"),
         (2, "Desktop Computer", 800.00, "2023-02-20"),
         (3, "Gaming Mouse", 50.00, "2023-03-10")]
P2024 = [(1, "Tablet", 500.00, "2024-01-05"),
         (2, "Smartphone", 700.00, "2024-02-15"),
         (3, "Wireless Headphones", 150.00, "2024-03-25")]

SCHEMA = "id long, product_name string, amount double, sale_date string"


@pytest.fixture(scope="module")
def view(spark):
    t23 = spark.createDataFrame(P2023, SCHEMA)
    t24 = spark.createDataFrame(P2024, SCHEMA)
    i23 = build_index(t23, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="product_name")]))
    i24 = build_index(t24, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="product_name")]))
    return (t23, i23), (t24, i24)


def _view_search(view, qstr):
    # the view's @@@ fans out to each branch's own index, then UNION ALL
    out = None
    for docs, idx in view:
        m = compile_query(idx, ast.Parse(qstr,
                                         field="product_name")) \
            .select("doc_id")
        part = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
        out = part if out is None else out.unionAll(part)
    return out


def test_individual_tables(view):
    (t23, i23), (t24, i24) = view
    m = compile_query(i23, ast.Parse("laptop", field="product_name"))
    assert [r[0] for r in m.select("doc_id").collect()] == [1]
    m = compile_query(i24, ast.Parse("tablet", field="product_name"))
    assert [r[0] for r in m.select("doc_id").collect()] == [1]


def test_view_union_search(view):
    rows = (_view_search(view, "laptop OR tablet")
            .orderBy("id", "product_name")
            .select("id", "product_name").collect())
    # both branches contribute an id=1 row (UNION ALL keeps both)
    assert [(r[0], r[1]) for r in rows] == [(1, "Laptop"), (1, "Tablet")]


def test_view_with_attribute_filter(view):
    rows = (_view_search(view, "laptop OR tablet OR computer")
            .filter(F.col("amount") > 100)
            .orderBy(F.col("amount").desc())
            .select("id", "product_name", "amount").collect())
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, "Laptop", 1200.00), (2, "Desktop Computer", 800.00),
        (1, "Tablet", 500.00)]
