"""join_order_by_is_null.out golden (PUBLIC reference behavior, tables
replicated inline — issue #4751): ORDER BY expressions containing
IS NULL / IS NOT NULL still ride the TopK join pushdown — same rows as
the fallback path, and no "not using Top K scan" warning, because the
null-test rides the base column's fast data.

Ref: pg_search/tests/pg_regress/expected/join_order_by_is_null.out
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast, search
from sparksearch.query.compiler import compile_query

COMPANIES = [(101, "Acme"), (102, "Globex"), (103, None),
             (104, "Initech"), (105, None)]
PEOPLE = [(201, 101), (202, 101), (203, 102), (204, 104)]


@pytest.fixture(scope="module")
def join_fixture(spark):
    companies = spark.createDataFrame(COMPANIES, "id long, name string")
    people = spark.createDataFrame(PEOPLE, "id long, company_id long")
    # reference DDL: text_fields='{"name": {"fast": true}}' — the
    # EXPLICIT fast flag is what lets the tokenized field serve ORDER BY
    cidx = build_index(companies, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name", fast=True)]))
    return cidx, companies, people


def _joined_ids(cidx, people, null_test: str):
    matched = compile_query(cidx, ast.All()).select("doc_id")
    c = cidx.docs.join(matched, cidx.docs["id"] == matched["doc_id"],
                       "left_semi")
    j = (people.alias("p")
         .join(F.broadcast(c.alias("c")),
               F.col("p.company_id") == F.col("c.id"), "inner"))
    out = (j.orderBy(F.expr(f"c.name {null_test}").asc(),
                     F.col("c.name").asc_nulls_last(),
                     F.col("c.id").asc())
           .limit(26).select(F.col("c.id")))
    return [r[0] for r in out.collect()]


def test_order_by_is_null(join_fixture):
    cidx, _, people = join_fixture
    assert _joined_ids(cidx, people, "IS NULL") == [101, 101, 102, 104]


def test_order_by_is_not_null(join_fixture):
    cidx, _, people = join_fixture
    assert _joined_ids(cidx, people, "IS NOT NULL") == \
        [101, 101, 102, 104]


def test_matches_fallback_path(join_fixture):
    # TEST 2: the pushdown rows equal the plain-SQL fallback rows
    _, companies, people = join_fixture
    fb = (people.join(companies,
                      people["company_id"] == companies["id"], "inner")
          .orderBy(F.expr("name IS NULL").asc(),
                   companies["name"].asc_nulls_last(),
                   companies["id"].asc())
          .limit(26).select(companies["id"]))
    assert [r[0] for r in fb.collect()] == [101, 101, 102, 104]


def test_is_null_sort_no_topk_warning(join_fixture):
    # the IS NULL pathkey rides the name fast field — check_topk_scan
    # stays silent (the issue was exactly that it refused pushdown)
    cidx, _, _ = join_fixture
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = search(cidx, ast.All(), limit=26,
                      order_by=[("name IS NULL", "asc"), ("name", "asc"),
                                ("id", "asc")],
                      columns=["id"], with_score=False).collect()
    assert [r[0] for r in rows] == [101, 102, 104, 103, 105]
