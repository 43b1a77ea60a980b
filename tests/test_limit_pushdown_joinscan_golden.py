"""limit_pushdown_joinscan.out + joinscan_cross_table_or.out goldens
(PUBLIC reference behavior, tables replicated inline):

- #4718 family: LIMIT applied AFTER non-pushable post-filters
  (NOT EXISTS against an unindexed table, IN-subquery predicates,
  OR-wrapped SubPlans, LIMIT+OFFSET) must return the full page — the
  reference bails out of its LIMIT pushdown in these shapes; Spark's
  plan applies limits above filters naturally, so the COUNTS are the
  pin (26 in every case).
- #5177: a cross-table OR containing a NOT arm pushed into a nested
  sub-join must not be dropped — 2 specific rows survive.

Ref: pg_search/tests/pg_regress/expected/limit_pushdown_joinscan.out
     pg_search/tests/pg_regress/expected/joinscan_cross_table_or.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

SENIORITY = {0: "manager", 1: "director", 2: "individual_contributor",
             3: "executive"}


@pytest.fixture(scope="module")
def lj(spark):
    companies = spark.createDataFrame(
        [(i, f"company_{i}") for i in range(1, 101)],
        "id long, name string")
    people = spark.createDataFrame(
        [(i, ((i - 1) % 100) + 1 if i <= 180 else None, f"person_{i}",
          ((i - 1) % 5) + 1, f"person_{i}@example.com", SENIORITY[i % 4])
         for i in range(1, 201)],
        "id long, company_id long, name string, dept_id long, "
        "email string, seniority_slug string")
    excluded_emails = spark.createDataFrame(
        [(i, i) for i in range(1, 4)], "id long, company_id long")
    job_openings = spark.createDataFrame(
        [(i, i) for i in range(1, 51)], "id long, company_id long")
    departments = spark.createDataFrame(
        [(i, i <= 3) for i in range(1, 6)], "id long, active boolean")
    excluded_contacts = spark.createDataFrame(
        [(i, 1, f"person_{i}@example.com") for i in range(1, 11)],
        "id long, user_id long, email string")
    c_idx = build_index(companies, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    p_idx = build_index(people, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="seniority_slug",
                                 tokenizer="keyword")]))
    return dict(companies=companies, people=people,
                excluded_emails=excluded_emails,
                job_openings=job_openings, departments=departments,
                excluded_contacts=excluded_contacts,
                c_idx=c_idx, p_idx=p_idx)


def _all_companies(lj):
    m = compile_query(lj["c_idx"], ast.All()).select("doc_id")
    return lj["companies"].join(m, lj["companies"]["id"] == m["doc_id"],
                                "left_semi")


def test_8_anti_join_plus_limit(lj):
    """NOT EXISTS against an unindexed table filters BEFORE LIMIT 26."""
    c = _all_companies(lj)
    got = (c.join(lj["excluded_emails"].select(
        F.col("company_id").alias("xid")),
        c["id"] == F.col("xid"), "left_anti")
        .orderBy("name").limit(26))
    assert got.count() == 26
    first = got.select("id", "name").collect()
    # excluded companies 1-3 never appear
    assert all(r["id"] > 3 for r in first)


def test_9_semi_join_non_bm25_predicate(lj):
    c = _all_companies(lj).alias("c")
    p = lj["people"].alias("p")
    openings = lj["job_openings"].select(F.col("company_id").alias("jid"))
    got = (c.join(p, F.col("c.id") == F.col("p.company_id"))
           .join(openings, F.col("c.id") == F.col("jid"), "left_semi")
           .select(F.col("c.id").alias("id"))
           .orderBy("id").limit(26))
    assert got.count() == 26


def test_10_or_wrapped_subplan(lj):
    c = _all_companies(lj).alias("c")
    p = lj["people"].alias("p")
    active = lj["departments"].filter("active") \
        .select(F.col("id").alias("did"))
    j = (c.join(p, F.col("c.id") == F.col("p.company_id"))
         .join(active, F.col("p.dept_id") == F.col("did"), "left")
         .filter(F.col("p.dept_id").isNull() | F.col("did").isNotNull())
         .select(F.col("c.id").alias("id"), F.col("p.name"))
         .orderBy("id").limit(26))
    assert j.count() == 26


def test_11_all_absorbed_topk(lj):
    c = _all_companies(lj).alias("c")
    p = lj["people"].alias("p")
    got = (c.join(p, F.col("c.id") == F.col("p.company_id"))
           .select(F.col("c.id").alias("id"), F.col("p.name"))
           .orderBy("id").limit(26).collect())
    assert len(got) == 26
    assert [r["id"] for r in got[:4]] == [1, 1, 2, 2]


def test_12_limit_offset_with_outer_predicates(lj):
    c = _all_companies(lj)
    got = (c.join(lj["excluded_emails"].select(
        F.col("company_id").alias("xid")),
        c["id"] == F.col("xid"), "left_anti")
        .orderBy("name")
        .offset(10).limit(26))
    assert got.count() == 26


def test_13_combined_unsafe_predicates(lj):
    """seniority IN-list + NOT EXISTS on email + OR-wrapped company IN."""
    m = compile_query(lj["p_idx"], ast.All()).select("doc_id")
    p = lj["people"].join(m, lj["people"]["id"] == m["doc_id"],
                          "left_semi").alias("p")
    exc = lj["excluded_contacts"].filter(F.col("user_id") == 1) \
        .select(F.col("email").alias("xmail"))
    cids = lj["companies"].select(F.col("id").alias("cid"))
    got = (p.filter(F.col("seniority_slug").isin("manager", "director"))
           .join(exc, F.col("p.email") == F.col("xmail"), "left_anti")
           .join(cids, F.col("p.company_id") == F.col("cid"), "left")
           .filter(F.col("p.company_id").isNull()
                   | F.col("cid").isNotNull())
           .orderBy(F.col("p.id").desc()).limit(26))
    assert got.count() == 26


# --- joinscan_cross_table_or.out (issue #5177) --------------------------------

def test_5177_cross_table_or_with_not_arm(spark):
    """(u.name @@@ 'bob' AND NOT p.name @@@ 'bob') OR p.name @@@ 'bob'
    through a nested (products ⋈ users) ⋈ orders join — the OR must
    survive; exactly two triples qualify."""
    users = spark.createDataFrame(
        [(1, "bob"), (2, "alice"), (3, "cloe"), (4, "brandy"),
         (5, "sally")], "id int, name string")
    products = spark.createDataFrame(
        [(1, "cloe", 10), (2, "alice", 20), (3, "sally", 30),
         (4, "brisket", 40), (5, "bob", 50)],
        "id int, name string, age int")
    orders = spark.createDataFrame(
        [(101, 10), (102, 20), (103, 30), (104, 40), (105, 50)],
        "id int, age int")
    u_idx = build_index(users, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword")]))
    p_idx = build_index(products, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword")]))
    um = compile_query(u_idx, ast.Term("name", "bob")) \
        .select(F.col("doc_id").alias("u_k"))
    pm = compile_query(p_idx, ast.Term("name", "bob")) \
        .select(F.col("doc_id").alias("p_k"))
    j = (orders.alias("o")
         .join(products.alias("p").join(
             users.alias("u"), F.col("u.id") == F.col("p.id")),
             F.col("p.age") == F.col("o.age"))
         .join(um, F.col("u.id") == F.col("u_k"), "left")
         .join(pm, F.col("p.id") == F.col("p_k"), "left")
         .filter((F.col("u_k").isNotNull() & F.col("p_k").isNull())
                 | F.col("p_k").isNotNull())
         .select(F.col("u.id").alias("uid"),
                 F.col("u.name").alias("uname"),
                 F.col("p.id").alias("pid"),
                 F.col("p.name").alias("pname"),
                 F.col("o.id").alias("oid"))
         .orderBy("uid", "pid", "oid").limit(20).collect())
    assert [tuple(r) for r in j] == [
        (1, "bob", 1, "cloe", 101),
        (5, "sally", 5, "bob", 105)]
