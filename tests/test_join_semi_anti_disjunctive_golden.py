"""join_semi_anti_disjunctive.out golden (PUBLIC reference behavior,
corpus replicated by the same generation rules): EXISTS / NOT EXISTS
subqueries whose join condition is a DISJUNCTION — 2-arm and 3-arm ORs
over keyword fields, scalar arms (length()>k, Var=Const), inequality
and mixed-operator arms, AND nested inside OR, NULL semantics on OR
arms, and varchar (RelabelType) columns.  The reference absorbs these
into a DataFusion NestedLoopJoin; Spark plans semi/anti joins with
arbitrary conditions natively (BroadcastNestedLoopJoin for non-equi),
so only the row sets are pinned here.

Ref: pg_search/tests/pg_regress/expected/join_semi_anti_disjunctive.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _items_rows(n):
    return [(i, f"name_{i}",
             f"alt_{i}" if i % 3 == 0 else None,
             "target" if i % 2 == 0 else "other")
            for i in range(1, n + 1)]


def _exclusion_rows(n_name, n_alt):
    pats = [(f"name_{i}", "name-based")
            for i in range(1, n_name + 1) if i % 5 == 0]
    pats += [(f"alt_{i}", "alt-based")
             for i in range(1, n_alt + 1) if i % 3 == 0 and i % 15 == 0]
    return [(k + 1, p, r) for k, (p, r) in enumerate(pats)]


KW = dict(tokenizer="keyword")


@pytest.fixture(scope="module")
def corpus(spark):
    items = spark.createDataFrame(
        _items_rows(500),
        "id long, name string, alt_name string, category string")
    exclusions = spark.createDataFrame(
        _exclusion_rows(250, 500), "id long, pattern string, reason string")
    i_idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", **KW),
                     FieldConfig(name="alt_name", **KW),
                     FieldConfig(name="category", **KW)]))
    e_idx = build_index(exclusions, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="pattern", **KW),
                     FieldConfig(name="reason", **KW)]))
    return items, exclusions, i_idx, e_idx


def _matched(items, idx, query):
    m = compile_query(idx, query).select("doc_id")
    return items.join(m, items["id"] == m["doc_id"]).drop("doc_id")


def _ids(df, desc=True, limit=10):
    order = F.col("id").desc() if desc else F.col("id").asc()
    return [r["id"] for r in
            df.select("id").orderBy(order).limit(limit).collect()]


def _target(corpus):
    items, _, i_idx, _ = corpus
    return _matched(items, i_idx,
                    ast.Parse('category:"target"')).alias("i")


def test_1_not_exists_two_arm_or(corpus):
    """Section 1: the core #4776 repro."""
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.col("e.pattern") == F.col("i.alt_name")), "left_anti")
    assert _ids(got) == [500, 498, 496, 494, 492, 490, 488, 486, 484, 482]


def test_2_exists_two_arm_or(corpus):
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.col("e.pattern") == F.col("i.alt_name")), "left_semi")
    assert _ids(got, desc=False) == [10, 20, 30, 40, 50, 60, 70, 80, 90,
                                     100]


def test_3_not_exists_three_arm_or(corpus):
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.col("e.pattern") == F.col("i.alt_name"))
        | (F.col("e.pattern") == F.col("i.category")), "left_anti")
    assert _ids(got) == [500, 498, 496, 494, 492, 490, 488, 486, 484, 482]


def test_5_scalar_arm_in_or(corpus):
    """Section 5: one arm is a scalar predicate on the inner side only
    (length(e.pattern) > 100 — never true here)."""
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.length(F.col("e.pattern")) > 100), "left_anti")
    assert _ids(got, limit=5) == [500, 498, 496, 494, 492]


def test_6_inequality_join_condition(corpus):
    """Section 6: e.id <> i.id — some exclusion always differs, so
    NOT EXISTS eliminates every row."""
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, F.col("e.id") != F.col("i.id"), "left_anti")
    assert _ids(got) == []


def test_7_mixed_operators_in_or(corpus):
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, (F.col("e.id") > F.col("i.id"))
        | (F.col("e.pattern") == F.col("i.name")), "left_anti")
    assert _ids(got) == [500, 498, 496, 494, 492, 490, 488, 486, 484, 482]


def test_8_exists_var_eq_const_arm(corpus):
    """Section 8: one OR arm is Var = Const (e.id = 42) — true for every
    outer row, so EXISTS keeps all of them."""
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.col("e.id") == F.lit(42)), "left_semi")
    assert _ids(got) == [500, 498, 496, 494, 492, 490, 488, 486, 484, 482]


def test_9_and_nested_inside_or(corpus):
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, ((F.col("e.pattern") == F.col("i.name"))
            & (F.col("e.id") > F.col("i.id")))
        | (F.col("e.pattern") == F.col("i.alt_name")), "left_anti")
    assert _ids(got) == [500, 498, 496, 494, 492, 490, 488, 486, 484, 482]


def test_10_single_equi_key_regression(corpus):
    _, exclusions, _, _ = corpus
    e = exclusions.alias("e")
    got = _target(corpus).join(
        e, F.col("e.pattern") == F.col("i.name"), "left_anti")
    assert _ids(got) == [500, 498, 496, 494, 492, 490, 488, 486, 484, 482]


def test_11_null_semantics_on_or_arms(corpus):
    """Section 11: odd ids have NULL alt_name; NULL = pattern is never
    a match, same as PostgreSQL's three-valued logic."""
    items, exclusions, i_idx, _ = corpus
    i = _matched(items, i_idx, ast.Parse('category:"other"')).alias("i")
    e = exclusions.alias("e")
    got = i.join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.col("e.pattern") == F.col("i.alt_name")), "left_anti")
    assert _ids(got) == [499, 497, 493, 491, 489, 487, 485, 483, 481, 479]


def test_12_varchar_relabel_path(spark):
    """Section 12: varchar columns (200-row corpus, 100 exclusions)."""
    items = spark.createDataFrame(
        _items_rows(200),
        "id long, name string, alt_name string, category string")
    exclusions = spark.createDataFrame(
        [(k + 1, f"name_{i}") for k, i in
         enumerate(i for i in range(1, 101) if i % 5 == 0)],
        "id long, pattern string")
    i_idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", **KW),
                     FieldConfig(name="alt_name", **KW),
                     FieldConfig(name="category", **KW)]))
    i = _matched(items, i_idx, ast.Parse('category:"target"')).alias("i")
    e = exclusions.alias("e")
    got = i.join(
        e, (F.col("e.pattern") == F.col("i.name"))
        | (F.col("e.pattern") == F.col("i.alt_name")), "left_anti")
    assert _ids(got) == [200, 198, 196, 194, 192, 190, 188, 186, 184, 182]
