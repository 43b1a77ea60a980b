"""join_semi_anti.out golden (PUBLIC reference behavior): semi / anti
join shapes through the join scan on the 2000-row table_a/table_b
corpus (a_id = i; group_1 = every 10th row; target_category = even
rows).

Sections: (1) IN semi join + search filter; (2a) NOT IN with a
non-null-provable subquery; (2b) NOT EXISTS anti join; (3) semi AND
anti together; (4) tuple (id, category) IN semi join; (5) SELECT *
ORDER BY varchar (RelabelType repro); (6) semi join with a maximally
selective outer filter.

Ref: pg_search/tests/pg_regress/expected/join_semi_anti.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

TARGET_PAGE = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


@pytest.fixture(scope="module")
def corpus(spark):
    i = F.col("id")
    table_a = spark.range(1, 2001).select(
        i.alias("id"),
        F.when(i % 2 == 0, "target_category")
         .otherwise("other_category").alias("category"))
    table_b = spark.range(1, 2001).select(
        i.alias("id"),
        F.when(i % 10 == 0, "group_1").otherwise("group_2")
         .alias("group_id"),
        i.alias("a_id"),
        F.when(i % 2 == 0, "target_category")
         .otherwise("other_category").alias("category"))
    a_idx = build_index(table_a, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", tokenizer="keyword",
                                 fast=True)]))
    b_idx = build_index(table_b, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="group_id", tokenizer="keyword",
                                 fast=True, lowercase=False),
                     FieldConfig(name="category", tokenizer="keyword",
                                 fast=True)],
        numeric_fields=["a_id"]))
    return table_a, table_b, a_idx, b_idx


def _target_a(corpus):
    table_a, _, a_idx, _ = corpus
    return table_a.join(
        compile_query(a_idx, ast.Term("category", "target_category"))
        .select(F.col("doc_id").alias("mid")),
        table_a["id"] == F.col("mid"), "left_semi")


def _b_subquery_aids(corpus, groups):
    _, table_b, _, b_idx = corpus
    q = ast.TermSet("group_id", groups) if len(groups) > 1 \
        else ast.Term("group_id", groups[0])
    return table_b.join(compile_query(b_idx, q)
                        .select(F.col("doc_id").alias("mid")),
                        table_b["id"] == F.col("mid"), "left_semi") \
                  .select(F.col("a_id").alias("sub_id"))


def _page(df):
    return [r["id"] for r in df.orderBy("id").limit(10).collect()]


def test_1_semi_join(corpus):
    got = _target_a(corpus).join(_b_subquery_aids(corpus, ["group_1"]),
                                 F.col("id") == F.col("sub_id"),
                                 "left_semi")
    assert _page(got) == TARGET_PAGE


def test_2_anti_join_not_in_and_not_exists(corpus):
    """groups 3/4 are empty → the anti join excludes nothing; the first
    10 even ids come back (both the NOT IN and NOT EXISTS forms)."""
    sub = _b_subquery_aids(corpus, ["group_3", "group_4"])
    got = _target_a(corpus).join(sub, F.col("id") == F.col("sub_id"),
                                 "left_anti")
    assert _page(got) == [2, 4, 6, 8, 10, 12, 14, 16, 18, 20]


def test_3_semi_and_anti(corpus):
    got = (_target_a(corpus)
           .join(_b_subquery_aids(corpus, ["group_1"]),
                 F.col("id") == F.col("sub_id"), "left_semi")
           .join(_b_subquery_aids(corpus, ["group_3", "group_4"]),
                 F.col("id") == F.col("sub_id"), "left_anti"))
    assert _page(got) == TARGET_PAGE


def test_4_tuple_semi_join(corpus):
    """(id, category) IN (SELECT a_id, category ...) under pdb.all()."""
    table_a, table_b, a_idx, b_idx = corpus
    all_a = table_a.join(compile_query(a_idx, ast.All())
                         .select(F.col("doc_id").alias("mid")),
                         table_a["id"] == F.col("mid"), "left_semi")
    sub = table_b.join(compile_query(b_idx, ast.Term("group_id", "group_1"))
                       .select(F.col("doc_id").alias("mid")),
                       table_b["id"] == F.col("mid"), "left_semi") \
                 .select(F.col("a_id").alias("sub_id"),
                         F.col("category").alias("sub_cat"))
    got = all_a.join(sub, (F.col("id") == F.col("sub_id"))
                     & (F.col("category") == F.col("sub_cat")),
                     "left_semi")
    assert _page(got) == TARGET_PAGE


def test_5_select_star_order_by_varchar(corpus):
    got = _target_a(corpus).join(_b_subquery_aids(corpus, ["group_1"]),
                                 F.col("id") == F.col("sub_id"),
                                 "left_semi")
    rows = got.orderBy(F.col("category").asc(), F.col("id").asc()) \
              .limit(10).collect()
    assert [r["id"] for r in rows] == TARGET_PAGE
    assert all(r["category"] == "target_category" for r in rows)


def test_6_selective_outer_filter(corpus):
    """id:1 is maximally selective on the outer side."""
    table_a, table_b, a_idx, _ = corpus
    outer = table_a.join(compile_query(a_idx, ast.Term("id", 1))
                         .select(F.col("doc_id").alias("mid")),
                         table_a["id"] == F.col("mid"), "left_semi")
    got = outer.join(table_b.select(F.col("a_id").alias("sub_id")),
                     F.col("id") == F.col("sub_id"), "left_semi")
    rows = got.orderBy("id").limit(10).collect()
    assert [(r["id"], r["category"]) for r in rows] == \
        [(1, "other_category")]
