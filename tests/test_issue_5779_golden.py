"""issue_5779.out + issue_4906_ltree_op_absent.out goldens (PUBLIC
reference behavior).

- issue_5779: ``title_x === $1::pdb.fuzzy(2, f, t)`` — a fuzzy-cast
  RHS must behave identically whether the needle arrives as a literal
  or a late-bound parameter (the generic-plan bug); seven repeated
  executions return the same fuzzy match set (ids 1, 2, 4: 'quick'
  within OSA distance 2 of quick/qwick/quiick, transpositions on).
- issue_4906: a non-ltree query (``body @@@ 'document' AND rating >
  1``) plans and returns {2, 3} in a database with no ltree operator,
  and ``array_agg`` is rejected from the aggregate scan with the
  reference's ``unsupported aggregate function`` warning (falling back
  to the plain plan, which computes the same array).

Ref: pg_search/tests/pg_regress/expected/{issue_5779,
issue_4906_ltree_op_absent}.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import sql_aggregate_spec
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [(1, "the quick brown fox"), (2, "the qwick brown fox"),
        (3, "lazy dog"), (4, "quiick brown"), (5, "nothing here")]


@pytest.fixture(scope="module")
def fz(spark):
    docs = spark.createDataFrame(ROWS, "id long, title_x string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title_x")]))
    return idx, docs


def _fuzzy_rows(fz, needle):
    idx, docs = fz
    q = ast.Boolean(must=[
        ast.Fuzzy("title_x", needle, distance=2, prefix=False,
                  transposition_cost_one=True),
        ast.All()])
    m = compile_query(idx, q).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .orderBy("id").collect())
    return [(r["id"], r["title_x"]) for r in got]


WANT = [(1, "the quick brown fox"), (2, "the qwick brown fox"),
        (4, "quiick brown")]


def test_fuzzy_literal_baseline(fz):
    assert _fuzzy_rows(fz, "quick") == WANT


def test_fuzzy_param_stable_across_reexecution(fz):
    # the golden EXECUTEs seven times chasing the custom→generic plan
    # switch; the invariant is identical rows on every execution
    for _ in range(7):
        assert _fuzzy_rows(fz, "quick") == WANT


# --- issue_4906_ltree_op_absent ----------------------------------------------

def test_non_ltree_query_plans_without_ltree(spark):
    docs = spark.createDataFrame(
        [(1, "alpha document", 1), (2, "beta document", 2),
         (3, "gamma document", 3)],
        "id long, body string, rating int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")],
        numeric_fields=["rating"]))
    q = ast.HeapFilter(ast.Parse("document", field="body"), "rating > 1")
    m = compile_query(idx, q).select("doc_id")
    got = sorted(r["doc_id"] for r in m.collect())
    assert got == [2, 3]
    # array_agg can't ride the aggregate scan — reference warning text —
    # and the fallback computes the same array
    with pytest.warns(UserWarning,
                      match=r"unsupported aggregate function: array_agg"):
        assert sql_aggregate_spec(idx, "array_agg", "id") is None
    arr = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .agg(F.sort_array(F.collect_list("id")).alias("a"))
           .first()["a"])
    assert arr == [2, 3]


def test_sql_aggregate_spec_whitelist(spark):
    docs = spark.createDataFrame([(1, "x", 2)],
                                 "id long, body string, n int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")],
        numeric_fields=["n"]))
    assert sql_aggregate_spec(idx, "SUM", "n") == {"sum": {"field": "n"}}
    assert sql_aggregate_spec(idx, "avg", "COALESCE(n, 0)") == \
        {"avg": {"field": "n", "missing": 0.0}}
    assert sql_aggregate_spec(idx, "count", "*") == \
        {"value_count": {"field": "id"}}
