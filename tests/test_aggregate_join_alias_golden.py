"""aggregate_join_alias.out + issue_5751.out goldens (PUBLIC reference
behavior): aggregates over search-driven joins.

- aggregate_join_alias (issue #4849): GROUP BY, COUNT(DISTINCT), and
  aggregate-internal ORDER BY all reference the HEAP column name
  (company_name) while the index stores it under an ALIAS
  (company_name_words) — the engine's alias resolution routes the heap
  name to the aliased expression field, and the join-aggregate results
  match the native plan.
- issue_5751: both conjuncts of ``s.state = 'active' AND e.user_id =
  'u1'`` across a join stay effective (count 2; OR of both states → 3;
  empty tables → 0; parameterized re-executions → 2).

Ref: pg_search/tests/pg_regress/expected/{aggregate_join_alias,
issue_5751}.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

CCCF = [(1, "Acme Corp", "acme.com"), (2, "Globex Inc", "globex.com"),
        (3, "Initech", "initech.com")]


@pytest.fixture(scope="module")
def alias_join(spark):
    cccf = spark.createDataFrame(
        CCCF, "company_id long, company_name string, "
              "company_domain string")
    ti = spark.createDataFrame([(1,), (2,), (3,)], "company_id long")
    idx = build_index(cccf, IndexSchema(
        key_field="company_id",
        text_fields=[
            FieldConfig(name="domain_lower",
                        source="lower(company_domain)",
                        tokenizer="literal_normalized",
                        filters=["ascii_folding"]),
            FieldConfig(name="company_name_words", source="company_name",
                        tokenizer="simple")]))
    joined = cccf.join(ti, "company_id")
    return idx, joined


def test_alias_resolution_routes_heap_name(alias_join):
    idx, _ = alias_join
    # querying by the HEAP name resolves to the aliased expression field
    assert idx.schema.field("company_name").name == "company_name_words"
    assert compile_query(idx, ast.Parse("acme",
                                        field="company_name")).count() == 1


def test_group_by_aliased_column(alias_join):
    _, joined = alias_join
    got = (joined.groupBy("company_name").count()
           .orderBy("company_name").collect())
    assert [(r["company_name"], r["count"]) for r in got] == \
        [("Acme Corp", 1), ("Globex Inc", 1), ("Initech", 1)]


def test_count_distinct_aliased_column(alias_join):
    _, joined = alias_join
    got = joined.agg(F.countDistinct("company_name").alias("c")) \
        .first()["c"]
    assert got == 3


def test_string_agg_internal_order_by(alias_join):
    _, joined = alias_join
    got = (joined.agg(F.concat_ws(
        ",", F.sort_array(F.collect_list("company_name"))).alias("s"))
        .first()["s"])
    assert got == "Acme Corp,Globex Inc,Initech"


# --- issue_5751 ----------------------------------------------------------------

SERIES = [(1, "active"), (2, "inactive"), (3, "active")]
ENTRIES = [(1, 1, "u1"), (2, 1, "u2"), (3, 2, "u1"), (4, 3, "u1")]


@pytest.fixture(scope="module")
def ser_ent(spark):
    s = spark.createDataFrame(SERIES, "id long, state string")
    e = spark.createDataFrame(ENTRIES,
                              "id long, series_id long, user_id string")
    s_idx = build_index(s, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="state", tokenizer="literal")]))
    e_idx = build_index(e, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="user_id", tokenizer="literal")],
        numeric_fields=["series_id"]))
    return s, e, s_idx, e_idx


def _joined_count(ser_ent, s_query, e_query):
    s, e, s_idx, e_idx = ser_ent
    sm = compile_query(s_idx, s_query).select(
        F.col("doc_id").alias("sid"))
    em = compile_query(e_idx, e_query).select(
        F.col("doc_id").alias("eid"))
    ee = e.join(em, e["id"] == F.col("eid"), "left_semi")
    ss = s.join(sm, s["id"] == F.col("sid"), "left_semi")
    return ee.join(ss.select(F.col("id").alias("jsid")),
                   ee["series_id"] == F.col("jsid")).count()


def test_both_join_conjuncts_effective(ser_ent):
    got = _joined_count(ser_ent, ast.Term("state", "active"),
                        ast.Term("user_id", "u1"))
    assert got == 2


def test_or_stays_one_predicate(ser_ent):
    q = ast.Boolean(should=[ast.Term("state", "active"),
                            ast.Term("state", "inactive")])
    assert _joined_count(ser_ent, q, ast.Term("user_id", "u1")) == 3


def test_empty_tables_count_zero(spark):
    s = spark.createDataFrame([], "id long, state string")
    e = spark.createDataFrame([], "id long, series_id long, "
                                  "user_id string")
    got = (e.join(s.filter(F.col("state") == "active")
                  .select(F.col("id").alias("jsid")),
                  e["series_id"] == F.col("jsid"))
           .filter(F.col("user_id") == "u1").count())
    assert got == 0


def test_parameterized_reexecution(ser_ent):
    # PREPARE ... EXECUTE('active', 'u1') in custom and generic modes:
    # the same compiled shape re-runs with late-bound needles
    for _ in range(2):
        assert _joined_count(ser_ent, ast.Term("state", "active"),
                             ast.Term("user_id", "u1")) == 2
