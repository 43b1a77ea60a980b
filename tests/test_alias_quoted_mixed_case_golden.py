"""alias_quoted_mixed_case.out golden (PUBLIC reference behavior,
issue #5525 repro replicated inline): quoted MIXED-CASE table aliases
("Parent"/"Child") flowing through both the aggregate path and the
search-driven join path — identifier case must survive alias
registration and column resolution end-to-end.

Ref: pg_search/tests/pg_regress/expected/alias_quoted_mixed_case.out
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def fx(spark):
    child = spark.createDataFrame(
        [(g, "inactive" if g % 5 == 0 else "active")
         for g in range(1, 11)], "id long, state string")
    parent = spark.createDataFrame(
        [(g, (g % 10) + 1, "user-1",
          dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(hours=g))
         for g in range(1, 11)],
        "id long, child_id long, owner string, updated_at timestamp")
    p_idx = build_index(parent, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="owner", tokenizer="literal")]))
    c_idx = build_index(child, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="state", tokenizer="literal")]))
    return parent, child, p_idx, c_idx


def _owner_matched(fx):
    parent, _, p_idx, _ = fx
    m = compile_query(p_idx, ast.Term("owner", "user-1")).select("doc_id")
    return parent.join(m, parent["id"] == m["doc_id"]).drop("doc_id")


def test_1_aggregate_over_mixed_case_aliases(fx):
    """count("Parent"."id") through a join with quoted aliases."""
    _, child, _, _ = fx
    P = _owner_matched(fx).alias("Parent")
    C = child.alias("Child")
    got = (P.join(C, (F.col("Parent.child_id") == F.col("Child.id"))
                  & (F.col("Child.state") == "active"))
           .agg(F.count(F.col("Parent.id")).alias("count")).collect())
    assert got[0]["count"] == 8


def test_1_control_lowercase_aliases(fx):
    _, child, _, _ = fx
    p = _owner_matched(fx).alias("parent")
    c = child.alias("child")
    got = (p.join(c, (F.col("parent.child_id") == F.col("child.id"))
                  & (F.col("child.state") == "active"))
           .agg(F.count(F.col("parent.id")).alias("count")).collect())
    assert got[0]["count"] == 8


def test_2_joinscan_with_mixed_case_aliases(fx):
    """Search predicate on "Child", TopK ORDER BY "Parent".updated_at."""
    _, child, _, c_idx = fx
    m = compile_query(c_idx, ast.Term("state", "active")).select("doc_id")
    C = child.join(m, child["id"] == m["doc_id"]).drop("doc_id") \
             .alias("Child")
    P = _owner_matched(fx).alias("Parent")
    got = (P.join(C, F.col("Parent.child_id") == F.col("Child.id"))
           .select(F.col("Parent.id").alias("id"),
                   F.col("Parent.updated_at").alias("u"))
           .orderBy(F.col("u").desc()).limit(12).collect())
    assert [r["id"] for r in got] == [10, 8, 7, 6, 5, 3, 2, 1]
