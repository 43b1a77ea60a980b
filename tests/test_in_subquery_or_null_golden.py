"""issue_4531.out golden (PUBLIC reference behavior): ``col IN
(SELECT ...) OR col IS NULL`` over a search match set — the LeftMark
join pattern.  NULL keys pass via the IS NULL arm (never via IN), an
empty inner table leaves ONLY the NULL rows, and the result is
identical with the join optimization on or off.

Ref: pg_search/tests/pg_regress/expected/issue_4531.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Widget", "A fine widget", 1),
    (2, "Gadget", "A cool gadget", 1),
    (3, "Gizmo", "A neat gizmo", None),
    (4, "Doohicky", "Another widget", 2),
    (5, "Thingamajig", "Yet another widget", 999),
]


def _setup(spark, products, supplier_ids):
    p = spark.createDataFrame(
        products, "id int, name string, description string, "
                  "supplier_id int")
    s = spark.createDataFrame([(i,) for i in supplier_ids], "id int")
    idx = build_index(p, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description")],
        numeric_fields=["supplier_id"]))
    return p, s, idx


def _query(p, s, idx):
    m = compile_query(idx, ast.Parse("widget", field="description")) \
        .select("doc_id")
    matched = p.join(m, p["id"] == m["doc_id"], "left_semi")
    # LeftMark analog: mark = supplier_id has a partner in s
    mark = (matched.join(s.select(F.col("id").alias("__sid")),
                         matched["supplier_id"] == F.col("__sid"), "left")
            .withColumn("__mark", F.col("__sid").isNotNull()).drop("__sid")
            .dropDuplicates(["id"]))
    out = (mark.filter(F.col("supplier_id").isNull() | F.col("__mark"))
           .orderBy(F.col("id").desc()).limit(10))
    return [r["id"] for r in out.select("id").collect()]


def test_1_or_is_null_pattern(spark):
    p, s, idx = _setup(spark, PRODUCTS, [1, 2])
    assert _query(p, s, idx) == [4, 1]


def test_2_plain_in_semi_join(spark):
    p, s, idx = _setup(spark, PRODUCTS, [1, 2])
    m = compile_query(idx, ast.Parse("widget", field="description")) \
        .select("doc_id")
    matched = p.join(m, p["id"] == m["doc_id"], "left_semi")
    got = (matched.join(s.select(F.col("id").alias("__sid")),
                        matched["supplier_id"] == F.col("__sid"),
                        "left_semi")
           .orderBy(F.col("id").desc()).limit(10).select("id").collect())
    assert [r["id"] for r in got] == [4, 1]


def test_3_all_null_keys(spark):
    rows = [(i, n, d, None) for i, n, d, _ in PRODUCTS]
    p, s, idx = _setup(spark, rows, [1, 2])
    assert _query(p, s, idx) == [5, 4, 1]


def test_4_empty_inner_only_null_rows_pass(spark):
    p, s, idx = _setup(spark, PRODUCTS, [])
    # only NULL-keyed matches survive; the sole NULL row (Gizmo) has no
    # 'widget' in its description → empty
    assert _query(p, s, idx) == []


def test_5_null_key_row_matching_search(spark):
    rows = PRODUCTS + [(6, "NullWidget", "A null widget", None)]
    p, s, idx = _setup(spark, rows, [1, 2])
    assert _query(p, s, idx) == [6, 4, 1]
