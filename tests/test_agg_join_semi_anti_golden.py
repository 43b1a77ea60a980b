"""aggregate_join_semi_anti.out golden (PUBLIC reference behavior):
GROUP BY aggregates over semi / anti joins produced by IN, EXISTS,
NOT EXISTS, and NOT IN with search predicates — including the
load-bearing NULL case: ``x NOT IN (... NULL ...)`` is UNKNOWN for
every outer row under SQL three-valued logic, so the query returns
ZERO rows, while plain left-anti (== NOT EXISTS) would wrongly ignore
the inner NULL.  Spark's null-aware anti join carries these semantics
natively when the query is written as SQL NOT IN.

Corpus (reference fixture): contacts 1..100 with 'Senior Programmer'
at every 5th id; list-A holds ids 1..50, list-B holds 40..60.

Ref: pg_search/tests/pg_regress/expected/aggregate_join_semi_anti.out
(issue #4911 regression family)
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def fixture(spark):
    contacts = spark.createDataFrame(
        [(s, "Senior Programmer" if s % 5 == 0 else "Other")
         for s in range(1, 101)],
        "contact_id long, job_title string")
    clist = spark.createDataFrame(
        [(i + 1, "list-A", s) for i, s in enumerate(range(1, 51))]
        + [(100 + i, "list-B", s) for i, s in enumerate(range(40, 61))],
        "id long, list_id string, ldf_id long")
    c_idx = build_index(contacts, IndexSchema(
        key_field="contact_id",
        text_fields=[FieldConfig(name="job_title")]))
    l_idx = build_index(clist, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="list_id",
                                 tokenizer="literal")]))
    # register the search-match sets as views for the SQL joins
    senior = (compile_query(c_idx, ast.Term("job_title", "senior"))
              .join(contacts.withColumnRenamed("contact_id", "doc_id"),
                    "doc_id")
              .select(F.col("doc_id").alias("contact_id"), "job_title"))
    senior.createOrReplaceTempView("asa_senior")

    def list_ids(needle):
        return (compile_query(l_idx, ast.Term("list_id", needle))
                .join(clist.withColumnRenamed("id", "doc_id"), "doc_id")
                .select("ldf_id"))
    list_ids("list-A").createOrReplaceTempView("asa_list_a")
    list_ids("list-B").createOrReplaceTempView("asa_list_b")
    return spark


def test_in_pullup_semi(fixture):
    # Test 1: IN (SELECT ...) -> semi join; seniors in 1..50 = 10
    got = fixture.sql("""
        SELECT job_title, COUNT(*) AS doc_count FROM asa_senior
        WHERE contact_id IN (SELECT ldf_id FROM asa_list_a)
        GROUP BY job_title ORDER BY doc_count DESC, job_title
    """).collect()
    assert [(r["job_title"], r["doc_count"]) for r in got] == \
        [("Senior Programmer", 10)]


def test_exists_not_exists(fixture):
    # Test 2: EXISTS A AND NOT EXISTS B -> semi + anti; ids 1..39 -> 7
    got = fixture.sql("""
        SELECT job_title, COUNT(*) AS doc_count FROM asa_senior c
        WHERE EXISTS (SELECT 1 FROM asa_list_a a
                      WHERE a.ldf_id = c.contact_id)
          AND NOT EXISTS (SELECT 1 FROM asa_list_b b
                          WHERE b.ldf_id = c.contact_id)
        GROUP BY job_title ORDER BY doc_count DESC, job_title
    """).collect()
    assert [(r["job_title"], r["doc_count"]) for r in got] == \
        [("Senior Programmer", 7)]


def test_not_in_without_nulls_matches_not_exists(fixture):
    # Test 3: NOT IN over a NULL-free inner == NOT EXISTS result
    got = fixture.sql("""
        SELECT job_title, COUNT(*) AS doc_count FROM asa_senior
        WHERE contact_id IN (SELECT ldf_id FROM asa_list_a)
          AND contact_id NOT IN (SELECT ldf_id FROM asa_list_b)
        GROUP BY job_title ORDER BY doc_count DESC, job_title
    """).collect()
    assert [(r["job_title"], r["doc_count"]) for r in got] == \
        [("Senior Programmer", 7)]


def test_multi_column_not_in(fixture):
    # Test 5: (a, b) NOT IN (...) over pair keys; seniors {5,10,15,20},
    # include 1..15 -> {5,10,15}, minus pairs (5,5),(10,10) -> {15}
    spark = fixture
    spark.createDataFrame(
        [(s, s, s, "Senior Programmer" if s % 5 == 0 else "Other")
         for s in range(1, 21)],
        "id long, a int, b int, label string") \
        .createOrReplaceTempView("asa_pair_outer")
    spark.createDataFrame([(1, 5, 5), (2, 10, 10)],
                          "pid long, x int, y int") \
        .createOrReplaceTempView("asa_pair_inner")
    spark.createDataFrame([(s,) for s in range(1, 16)], "id long") \
        .createOrReplaceTempView("asa_pair_include")
    got = spark.sql("""
        SELECT label, COUNT(*) AS doc_count FROM asa_pair_outer
        WHERE id IN (SELECT id FROM asa_pair_include)
          AND (a, b) NOT IN (SELECT x, y FROM asa_pair_inner)
          AND label LIKE 'Senior%'
        GROUP BY label ORDER BY doc_count DESC, label
    """).collect()
    assert [(r["label"], r["doc_count"]) for r in got] == \
        [("Senior Programmer", 1)]


def test_not_in_null_bearing_inner_returns_zero(fixture):
    # Test 6: the NULL bomb — x NOT IN (... NULL ...) is UNKNOWN for
    # every row, so the aggregate input is empty
    spark = fixture
    spark.createDataFrame(
        [(s, "Senior Programmer" if s % 5 == 0 else "Other")
         for s in range(1, 21)],
        "id long, label string").createOrReplaceTempView("asa_excl_outer")
    spark.createDataFrame([(s,) for s in range(1, 16)], "id long") \
        .createOrReplaceTempView("asa_excl_include")
    spark.createDataFrame([(1, 3), (2, None)],
                          "iid long, eid long") \
        .createOrReplaceTempView("asa_excl_inner")
    q = """
        SELECT label, COUNT(*) AS doc_count FROM asa_excl_outer
        WHERE id IN (SELECT id FROM asa_excl_include)
          AND id NOT IN (SELECT eid FROM asa_excl_inner)
          AND label LIKE 'Senior%'
        GROUP BY label ORDER BY doc_count DESC, label
    """
    assert spark.sql(q).count() == 0
    # sanity: removing the NULL row makes the same query return rows —
    # guards against passing with zero rows for the wrong reason
    spark.createDataFrame([(1, 3)], "iid long, eid long") \
        .createOrReplaceTempView("asa_excl_inner")
    got = spark.sql(q).collect()
    # seniors in include(1..15) = {5,10,15}, minus eid=3 (no senior) = 3
    assert [(r["label"], r["doc_count"]) for r in got] == \
        [("Senior Programmer", 3)]


def test_null_aware_anti_join_plan(fixture):
    """Spark plans single-column NOT IN as a null-aware anti join —
    the HashJoinExec null_equality=NullEqualsNothing analog."""
    plan = fixture.sql("""
        SELECT * FROM asa_senior
        WHERE contact_id NOT IN (SELECT ldf_id FROM asa_list_b)
    """)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
