"""issue_4910.out golden (PUBLIC reference behavior): 3-way EXISTS +
NOT EXISTS + range-on-key TopK over a 1000-row corpus — result rows
must be identical regardless of execution parallelism (the reference
pins serial and forced-parallel modes to the same 25 rows).

Expected: companies 1..10 pass EXISTS; even companies are excluded by
NOT EXISTS (speciality=salesforce); top revenue_rank among odd-company
contacts is 19, so the TopK is contact_id 19, 39, ..., 499.

Ref: pg_search/tests/pg_regress/expected/issue_4910.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

EXPECTED = [(19 + 20 * k, 9, 19) for k in range(25)]


@pytest.fixture(scope="module")
def corp(spark):
    cccf = spark.createDataFrame(
        [(s, s % 10, s % 20) for s in range(1, 1001)],
        "contact_id long, company_id long, revenue_rank int")
    exists_t = spark.createDataFrame(
        [(s, s) for s in range(1, 11)], "unique_id long, company_id long")
    not_exists_t = spark.createDataFrame(
        [(s, s, "salesforce" if s % 2 == 0 else "other")
         for s in range(1, 11)],
        "unique_id long, company_id long, speciality string")
    cccf_idx = build_index(cccf, IndexSchema(
        key_field="contact_id", text_fields=[],
        numeric_fields=["company_id", "revenue_rank"]))
    cne_idx = build_index(not_exists_t, IndexSchema(
        key_field="unique_id",
        text_fields=[FieldConfig(name="speciality", tokenizer="literal")],
        numeric_fields=["company_id"]))
    return cccf, exists_t, not_exists_t, cccf_idx, cne_idx


def _run(corp_fix, shuffle_partitions):
    cccf, exists_t, not_exists_t, cccf_idx, cne_idx = corp_fix
    spark = cccf.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        # contact_id @@@ range '(0,)' — exclusive lower bound on the key
        m = compile_query(cccf_idx, ast.Range(
            "contact_id", lower=0, lower_inclusive=False)).select("doc_id")
        base = cccf.join(m, cccf["contact_id"] == m["doc_id"], "left_semi")
        # NOT EXISTS arm: csa_not_exists rows matching speciality:salesforce
        sf = compile_query(cne_idx, ast.Parse(
            "speciality:salesforce")).select("doc_id")
        cne_sf = not_exists_t.join(
            sf, not_exists_t["unique_id"] == sf["doc_id"], "left_semi")
        out = (base
               .join(exists_t.select(F.col("company_id").alias("ek"))
                     .distinct(),
                     base["company_id"] == F.col("ek"), "left_semi")
               .join(cne_sf.select(F.col("company_id").alias("nk"))
                     .distinct(),
                     base["company_id"] == F.col("nk"), "left_anti")
               .orderBy(F.col("revenue_rank").desc_nulls_last(),
                        F.col("contact_id").asc())
               .limit(25))
        return [(r["contact_id"], r["company_id"], r["revenue_rank"])
                for r in out.collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_serial_mode(corp):
    assert _run(corp, 1) == EXPECTED


def test_parallel_mode(corp):
    """Same rows at high parallelism (the reference's
    debug_parallel_query = on invariance check)."""
    assert _run(corp, 32) == EXPECTED
