"""issue_4719.out + issue_4779.out goldens (PUBLIC reference
behavior): multi-way semi/anti join-scan shapes.

- issue_4719: ``p.id NOT IN (subquery)`` (null-aware anti) combined
  with ``(p.company_id IS NULL OR p.company_id IN (subquery))`` (the
  LeftMark OR-IS-NULL shape) on one outer relation, ORDER BY id DESC
  LIMIT 26 → ids 4, 1.
- issue_4779: two EXISTS semijoins over a 100-row preserved side with
  200-row children, TopK id DESC LIMIT 10 → 100..91, identical with
  either join path (the reference's RightSemi canonicalization); the
  EXISTS + NOT EXISTS variant is empty (every main id has b rows).

Ref: pg_search/tests/pg_regress/expected/{issue_4719,issue_4779}.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PEOPLE = [(1, 10, "hit"), (2, 20, "hit"), (3, 30, "hit"),
          (4, None, "hit"), (5, 99, "hit")]
EXPERIENCES = [(1, 2, 10, "exp"), (2, 5, 20, "exp"), (3, 3, 50, "exp")]
COMPANIES = [(10, "co"), (20, "co"), (30, "co")]


def test_not_in_plus_or_is_null_in(spark):
    p = spark.createDataFrame(PEOPLE,
                              "id long, company_id long, body string")
    x = spark.createDataFrame(
        EXPERIENCES, "id long, person_id long, company_id long, "
                     "body string")
    c = spark.createDataFrame(COMPANIES, "id long, body string")
    p_idx = build_index(p, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")],
        numeric_fields=["company_id"]))

    # NOT IN (SELECT person_id FROM x WHERE company_id IN (10,20,50)):
    # null-aware anti join
    sub = (x.filter(F.col("company_id").isin(10, 20, 50))
           .select(F.col("person_id").alias("pid")))
    base = p.join(compile_query(p_idx, ast.All()).select("doc_id"),
                  p["id"] == F.col("doc_id"), "left_semi")
    anti = base.join(sub, base["id"] == sub["pid"], "left_anti")
    # (company_id IS NULL OR company_id IN (SELECT id FROM c)):
    # the LeftMark OR-IS-NULL shape
    marked = anti.join(c.select(F.col("id").alias("cid")),
                       anti["company_id"] == F.col("cid"), "left") \
        .withColumn("mark", F.col("cid").isNotNull())
    got = (marked.filter(F.col("mark") | F.col("company_id").isNull())
           .select("id").distinct()
           .orderBy(F.col("id").desc()).limit(26).collect())
    assert [r["id"] for r in got] == [4, 1]


@pytest.fixture(scope="module")
def tri(spark):
    m = spark.range(1, 101).select(
        F.col("id"), F.concat(F.lit("val_"), F.col("id").cast("string"))
        .alias("val"))
    a = spark.range(1, 201).select(
        F.col("id"), ((F.col("id") % 100) + 1).alias("main_id"))
    b = spark.range(1, 201).select(
        F.col("id"), ((F.col("id") % 100) + 1).alias("main_id"))
    m_idx = build_index(m, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="val", tokenizer="literal")]))
    a_idx = build_index(a, IndexSchema(key_field="id", text_fields=[],
                                       numeric_fields=["main_id"]))
    b_idx = build_index(b, IndexSchema(key_field="id", text_fields=[],
                                       numeric_fields=["main_id"]))
    return m, a, b, m_idx, a_idx, b_idx


def _matched(df, idx):
    return df.join(compile_query(idx, ast.All()).select("doc_id"),
                   df["id"] == F.col("doc_id"), "left_semi")


def test_double_exists_semijoin_topk(tri):
    m, a, b, m_idx, a_idx, b_idx = tri
    mm = _matched(m, m_idx)
    aa = _matched(a, a_idx).select(F.col("main_id").alias("am"))
    bb = _matched(b, b_idx).select(F.col("main_id").alias("bm"))
    got = (mm.join(bb, mm["id"] == F.col("bm"), "left_semi")
           .join(aa, mm["id"] == F.col("am"), "left_semi")
           .select("id").orderBy(F.col("id").desc()).limit(10).collect())
    assert [r["id"] for r in got] == list(range(100, 90, -1))


def test_exists_plus_not_exists_is_empty(tri):
    m, a, b, m_idx, a_idx, b_idx = tri
    mm = _matched(m, m_idx)
    aa = _matched(a, a_idx).select(F.col("main_id").alias("am"))
    bb = _matched(b, b_idx).select(F.col("main_id").alias("bm"))
    got = (mm.join(bb, mm["id"] == F.col("bm"), "left_anti")
           .join(aa, mm["id"] == F.col("am"), "left_semi")
           .select("id").orderBy(F.col("id").desc()).limit(10).collect())
    assert got == []
