"""issue_4667.out golden (PUBLIC reference behavior): DISTINCT over
IS-NULL projections + an IN-list on a normalized literal field + the
LeftMark `(company_id IS NULL OR company_id IN (SELECT ...))` pattern —
the orphan key (company 999) is excluded, the NULL key passes.

Ref: pg_search/tests/pg_regress/expected/issue_4667.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PEOPLE = [
    (1, 100, "Alice Director", 5000, "director"),
    (2, None, "Bob Manager", 1200, "manager"),
    (3, 200, "Carol Manager", 800, "manager"),
    (4, 100, "Dan Staff", 300, "staff"),
    (5, 999, "Eve Orphan", 100, "manager"),
]


def test_distinct_mark_or_null(spark):
    people = spark.createDataFrame(
        PEOPLE, "id long, company_id long, full_name string, "
                "linkedin_followers int, seniority_slug string")
    companies = spark.createDataFrame([(100,), (200,)], "id long")
    idx = build_index(people, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="full_name",
                                 tokenizer="literal_normalized"),
                     FieldConfig(name="seniority_slug",
                                 tokenizer="literal_normalized")],
        numeric_fields=["linkedin_followers", "company_id"]))
    seniority = compile_query(
        idx, ast.TermSet("seniority_slug", ["manager", "director"])) \
        .select(F.col("doc_id").alias("sk"))
    base = people.join(seniority, people["id"] == F.col("sk"),
                       "left_semi")
    marked = (base.join(companies.select(F.col("id").alias("ck")),
                        base["company_id"] == F.col("ck"), "left")
              .withColumn("__mark", F.col("ck").isNotNull()).drop("ck"))
    got = (marked.filter(F.col("company_id").isNull() | F.col("__mark"))
           .select("id", F.col("full_name").alias("nameSort"),
                   F.col("full_name").isNull().alias("nameIsNull"),
                   F.col("linkedin_followers").alias("followersSort"),
                   F.col("seniority_slug").alias("senioritySort"))
           .distinct()
           .orderBy(F.col("id").desc()).limit(26).collect())
    assert [(r["id"], r["nameSort"], r["nameIsNull"], r["followersSort"],
             r["senioritySort"]) for r in got] == [
        (3, "Carol Manager", False, 800, "manager"),
        (2, "Bob Manager", False, 1200, "manager"),
        (1, "Alice Director", False, 5000, "director")]
