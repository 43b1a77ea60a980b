"""join_outer_edge.out golden (PUBLIC reference behavior, tables
replicated inline): outer-join edge cases through search scans —
ORDER BY the nullable side (null-extended rows sort as NULL keys),
score on the nullable side (0 for joined rows without a search
predicate, NULL for null-extended rows), cross-table OR as a post-join
filter, extra ON-clause predicates, non-equi ON conditions, and a FULL
join whose search predicate lives in a subquery (count = 120).

Corpus: oj_fact 1..100 (dim_id NULL when id%3=0, else id%40+1),
oj_dim 1..60 (price = 10·id).

Ref: pg_search/tests/pg_regress/expected/join_outer_edge.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def oj(spark):
    fact = spark.createDataFrame(
        [(g, None if g % 3 == 0 else (g % 40) + 1, f"alpha item {g}")
         for g in range(1, 101)],
        "id long, dim_id long, txt string")
    dim = spark.createDataFrame(
        [(g, f"beta item {g}", g * 10) for g in range(1, 61)],
        "id long, txt string, price long")
    fidx = build_index(fact, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="txt")]))
    didx = build_index(dim, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="txt")]))
    return fact, dim, fidx, didx


def _alpha_fact(fidx, fact):
    m = compile_query(fidx, ast.Parse("alpha", field="txt")) \
        .select("doc_id")
    return fact.join(m, fact["id"] == m["doc_id"], "left_semi")


def test_order_by_nullable_side(oj):
    fact, dim, fidx, _ = oj
    a = _alpha_fact(fidx, fact).alias("a")
    j = a.join(dim.alias("b"), F.col("a.dim_id") == F.col("b.id"), "left")
    rows = (j.orderBy(F.col("b.id").asc_nulls_first(), F.col("a.id").asc())
            .limit(8).select(F.col("a.id"), F.col("b.id")).collect())
    assert [(r[0], r[1]) for r in rows] == [
        (3, None), (6, None), (9, None), (12, None),
        (15, None), (18, None), (21, None), (24, None)]


def test_score_on_nullable_side(oj):
    # paradedb.score(b.id): 0 for joined rows (no search predicate on
    # b), NULL for null-extended rows
    fact, dim, fidx, didx = oj
    a = _alpha_fact(fidx, fact).alias("a")
    b_sc = compile_query(didx, ast.All()).select(
        F.col("doc_id").alias("b_did"), F.lit(0.0).alias("b_score"))
    j = (a.join(dim.alias("b"), F.col("a.dim_id") == F.col("b.id"),
                "left")
         .join(b_sc, F.col("b.id") == F.col("b_did"), "left"))
    rows = (j.orderBy(F.col("a.id").asc()).limit(8)
            .select(F.col("a.id"), F.col("b_score")).collect())
    assert [(r[0], r[1]) for r in rows] == [
        (1, 0.0), (2, 0.0), (3, None), (4, 0.0),
        (5, 0.0), (6, None), (7, 0.0), (8, 0.0)]


def test_cross_table_or_post_join(oj):
    fact, dim, fidx, didx = oj
    am = compile_query(fidx, ast.Parse("alpha", field="txt")) \
        .select(F.col("doc_id").alias("a_did"))
    bm = compile_query(didx, ast.Parse("beta", field="txt")) \
        .select(F.col("doc_id").alias("b_did"))
    j = (fact.alias("a")
         .join(dim.alias("b"), F.col("a.dim_id") == F.col("b.id"),
               "left")
         .join(am, F.col("a.id") == F.col("a_did"), "left")
         .join(bm, F.col("b.id") == F.col("b_did"), "left")
         .filter(F.col("a_did").isNotNull() | F.col("b_did").isNotNull()))
    rows = (j.orderBy(F.col("a.id").asc(), F.col("b.id").asc())
            .limit(8).select(F.col("a.id"), F.col("b.id")).collect())
    assert [(r[0], r[1]) for r in rows] == [
        (1, 2), (2, 3), (3, None), (4, 5),
        (5, 6), (6, None), (7, 8), (8, 9)]


def test_on_clause_extra_predicate(oj):
    # ON a.dim_id = b.id AND b.price > 100: dims 1..10 fail the ON
    # extra, so facts pointing there null-extend
    fact, dim, fidx, _ = oj
    a = _alpha_fact(fidx, fact).alias("a")
    j = a.join(dim.alias("b"),
               (F.col("a.dim_id") == F.col("b.id"))
               & (F.col("b.price") > 100), "left")
    rows = (j.orderBy(F.col("a.id").asc()).limit(8)
            .select(F.col("a.id"), F.col("b.id")).collect())
    assert [(r[0], r[1]) for r in rows] == [
        (1, None), (2, None), (3, None), (4, None),
        (5, None), (6, None), (7, None), (8, None)]


def test_non_equi_on_condition(oj):
    # ON a.dim_id = b.id AND a.id < b.price — the reference declines
    # JoinScan with a warning but returns these rows; Spark just runs it
    fact, dim, fidx, _ = oj
    a = _alpha_fact(fidx, fact).alias("a")
    j = a.join(dim.alias("b"),
               (F.col("a.dim_id") == F.col("b.id"))
               & (F.col("a.id") < F.col("b.price")), "left")
    rows = (j.orderBy(F.col("a.id").asc()).limit(8)
            .select(F.col("a.id"), F.col("b.id")).collect())
    assert [(r[0], r[1]) for r in rows] == [
        (1, 2), (2, 3), (3, None), (4, 5),
        (5, 6), (6, None), (7, 8), (8, 9)]


def test_full_join_subquery(oj):
    fact, dim, fidx, _ = oj
    f = _alpha_fact(fidx, fact).alias("f")
    j = f.join(dim.alias("b"), F.col("f.dim_id") == F.col("b.id"),
               "full")
    rows = (j.orderBy(F.col("f.id").asc_nulls_first(),
                      F.col("b.id").asc())
            .limit(12).select(F.col("f.id"), F.col("b.id")).collect())
    assert [(r[0], r[1]) for r in rows] == [
        (None, i) for i in range(41, 53)]
    assert j.count() == 120