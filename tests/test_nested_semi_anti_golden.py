"""issue_4532.out golden (PUBLIC reference behavior): nested SEMI/ANTI
join trees over search-filtered subqueries — p SEMI (c SEMI d), EXISTS
with inner NOT EXISTS, mixed SEMI+ANTI at one level, and three-level
nesting with key rewriting through equivalences.

Ref: pg_search/tests/pg_regress/expected/issue_4532.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def org(spark):
    regions = spark.createDataFrame(
        [(1, "North America"), (2, "Europe")], "id int, name string")
    companies = spark.createDataFrame(
        [(1, 1, "Acme Corp"), (2, 2, "Globex Inc"), (3, 1, "Initech")],
        "id int, region_id int, name string")
    departments = spark.createDataFrame(
        [(10, 1, "Engineering"), (20, 1, "Sales"),
         (30, 2, "Engineering"), (40, 3, "Marketing")],
        "id int, company_id int, name string")
    products = spark.createDataFrame(
        [(100, 1, "A fine widget"), (101, 1, "A cool gadget"),
         (200, 2, "A neat gizmo"), (300, 3, "A boring thing")],
        "id int, company_id int, description string")
    idx = {
        "r": build_index(regions, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="name")])),
        "c": build_index(companies, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="name")],
            numeric_fields=["region_id"])),
        "d": build_index(departments, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="name")],
            numeric_fields=["company_id"])),
        "p": build_index(products, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="description")],
            numeric_fields=["company_id"])),
    }
    return dict(r=regions, c=companies, d=departments, p=products,
                idx=idx)


def _m(org_fix, which, qstr, field):
    return compile_query(org_fix["idx"][which],
                         ast.Parse(qstr, field=field)).select("doc_id")


def _p_matched(org_fix, qstr):
    p = org_fix["p"]
    return p.join(_m(org_fix, "p", qstr, "description"),
                  p["id"] == F.col("doc_id"), "left_semi")


def _ids(df):
    return [r["id"] for r in
            df.orderBy("id").limit(10).select("id").collect()]


def test_1_nested_semi(org):
    """p SEMI (c SEMI d-with-Engineering) → 100, 101, 200."""
    d_eng = org["d"].join(_m(org, "d", "Engineering", "name"),
                          org["d"]["id"] == F.col("doc_id"), "left_semi")
    c_semi = org["c"].join(
        d_eng.select(F.col("company_id").alias("k")).distinct(),
        org["c"]["id"] == F.col("k"), "left_semi")
    p = _p_matched(org, "widget OR gadget OR gizmo")
    out = p.join(c_semi.select(F.col("id").alias("ck")),
                 p["company_id"] == F.col("ck"), "left_semi")
    assert _ids(out) == [100, 101, 200]


def test_2_nested_anti(org):
    """EXISTS(c) AND NOT EXISTS(d Marketing) → companies without a
    Marketing department → 100, 101, 200."""
    d_mkt = org["d"].join(_m(org, "d", "Marketing", "name"),
                          org["d"]["id"] == F.col("doc_id"), "left_semi")
    c_no_mkt = org["c"].join(
        d_mkt.select(F.col("company_id").alias("k")).distinct(),
        org["c"]["id"] == F.col("k"), "left_anti")
    p = _p_matched(org, "widget OR gadget OR gizmo OR boring")
    out = p.join(c_no_mkt.select(F.col("id").alias("ck")),
                 p["company_id"] == F.col("ck"), "left_semi")
    assert _ids(out) == [100, 101, 200]


def test_3_mixed_semi_anti(org):
    """Engineering present AND Marketing absent → 100, 101, 200."""
    d_eng = org["d"].join(_m(org, "d", "Engineering", "name"),
                          org["d"]["id"] == F.col("doc_id"), "left_semi")
    d_mkt = org["d"].join(_m(org, "d", "Marketing", "name"),
                          org["d"]["id"] == F.col("doc_id"), "left_semi")
    c = (org["c"]
         .join(d_eng.select(F.col("company_id").alias("k1")).distinct(),
               org["c"]["id"] == F.col("k1"), "left_semi")
         .join(d_mkt.select(F.col("company_id").alias("k2")).distinct(),
               org["c"]["id"] == F.col("k2"), "left_anti"))
    p = _p_matched(org, "widget OR gadget OR gizmo OR boring")
    out = p.join(c.select(F.col("id").alias("ck")),
                 p["company_id"] == F.col("ck"), "left_semi")
    assert _ids(out) == [100, 101, 200]


def test_4_flat_semi_baseline(org):
    c_acme = org["c"].join(_m(org, "c", "Acme", "name"),
                           org["c"]["id"] == F.col("doc_id"), "left_semi")
    p = _p_matched(org, "widget OR gadget")
    out = p.join(c_acme.select(F.col("id").alias("ck")),
                 p["company_id"] == F.col("ck"), "left_semi")
    assert _ids(out) == [100, 101]


def test_5_three_level_nesting(org):
    """p SEMI ((c SEMI r-America) SEMI d-Engineering) → 100, 101
    (Globex is in Europe; Initech has no Engineering)."""
    r_am = org["r"].join(_m(org, "r", "America", "name"),
                         org["r"]["id"] == F.col("doc_id"), "left_semi")
    d_eng = org["d"].join(_m(org, "d", "Engineering", "name"),
                          org["d"]["id"] == F.col("doc_id"), "left_semi")
    c = (org["c"]
         .join(r_am.select(F.col("id").alias("rk")),
               org["c"]["region_id"] == F.col("rk"), "left_semi")
         .join(d_eng.select(F.col("company_id").alias("dk")).distinct(),
               org["c"]["id"] == F.col("dk"), "left_semi"))
    p = _p_matched(org, "widget OR gadget OR gizmo OR boring")
    out = p.join(c.select(F.col("id").alias("ck")),
                 p["company_id"] == F.col("ck"), "left_semi")
    assert _ids(out) == [100, 101]
