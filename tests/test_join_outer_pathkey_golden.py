"""join_outer_pathkey.out + join_order_by_alias_expression.out goldens
(PUBLIC reference behavior, tables replicated inline): IN / NOT IN
subquery extraction across planner roots with per-table search
predicates and raw-term (===) inner filters, plus ORDER BY over an
indexed lower() expression alongside an aliased expression on the same
column.

Ref: pg_search/tests/pg_regress/expected/join_outer_pathkey.out
     pg_search/tests/pg_regress/expected/join_order_by_alias_expression.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def op(spark):
    companies = spark.createDataFrame(
        [(1, "Acme Corp"), (2, "Globex Inc"), (3, "Initech")],
        "id int, name string")
    products = spark.createDataFrame(
        [(100, 1, "A fine widget"), (101, 1, "A cool gadget"),
         (200, 2, "A neat gizmo"), (300, 3, "A boring thing")],
        "id int, company_id int, description string")
    tags = spark.createDataFrame(
        [(1, 100, "popular"), (2, 200, "popular"), (3, 300, "niche")],
        "id int, product_id int, tag string")
    categories = spark.createDataFrame(
        [(1, 100, "Electronics"), (2, 101, "Electronics"),
         (3, 200, "Hardware"), (4, 300, "Office")],
        "id int, product_id int, category_name string")
    c_idx = build_index(companies, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    p_idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    t_idx = build_index(tags, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="tag", tokenizer="keyword")]))
    return dict(companies=companies, products=products, tags=tags,
                categories=categories, c=c_idx, p=p_idx, t=t_idx)


def _keys(idx, q):
    return compile_query(idx, q).select("doc_id")


def test_in_plus_not_in_subplans(op):
    """IN (search subquery) AND NOT IN (=== raw-term subquery) AND own
    search predicate — product 300 is excluded by the 'niche' tag."""
    cm = _keys(op["c"], ast.Parse("Acme OR Globex OR Initech",
                                  field="name"))
    cids = op["companies"].join(cm, op["companies"]["id"] == cm["doc_id"],
                                "left_semi").select(F.col("id").alias("cid"))
    tm = _keys(op["t"], ast.Term("tag", "niche"))
    niche = op["tags"].join(tm, op["tags"]["id"] == tm["doc_id"],
                            "left_semi") \
        .select(F.col("product_id").alias("nid"))
    pm = _keys(op["p"], ast.Parse("widget OR gadget OR gizmo OR boring",
                                  field="description"))
    got = (op["products"]
           .join(pm, op["products"]["id"] == pm["doc_id"], "left_semi")
           .join(cids, F.col("company_id") == F.col("cid"), "left_semi")
           .join(niche, F.col("id") == F.col("nid"), "left_anti")
           .select("id", "description").orderBy("id").limit(10).collect())
    assert [tuple(r) for r in got] == [
        (100, "A fine widget"), (101, "A cool gadget"),
        (200, "A neat gizmo")]


def test_three_table_order_by_category(op):
    cm = _keys(op["c"], ast.Parse("Acme OR Globex", field="name"))
    c = op["companies"].join(cm, op["companies"]["id"] == cm["doc_id"],
                             "left_semi").alias("c")
    pm = _keys(op["p"], ast.Parse("widget OR gadget OR gizmo",
                                  field="description"))
    p = op["products"].join(pm, op["products"]["id"] == pm["doc_id"],
                            "left_semi").alias("p")
    got = (p.join(c, F.col("c.id") == F.col("p.company_id"))
           .join(op["categories"].alias("cat"),
                 F.col("cat.product_id") == F.col("p.id"))
           .select("p.id", "p.description", "cat.category_name")
           .orderBy("category_name", "id").limit(5).collect())
    assert [tuple(r) for r in got] == [
        (100, "A fine widget", "Electronics"),
        (101, "A cool gadget", "Electronics"),
        (200, "A neat gizmo", "Hardware")]


def test_in_search_subquery(op):
    tm = _keys(op["t"], ast.Term("tag", "popular"))
    pop = op["tags"].join(tm, op["tags"]["id"] == tm["doc_id"],
                          "left_semi") \
        .select(F.col("product_id").alias("pid"))
    pm = _keys(op["p"], ast.Parse("widget OR gizmo", field="description"))
    got = (op["products"]
           .join(pm, op["products"]["id"] == pm["doc_id"], "left_semi")
           .join(pop, F.col("id") == F.col("pid"), "left_semi")
           .select("id", "description").orderBy("id").limit(5).collect())
    assert [tuple(r) for r in got] == [
        (100, "A fine widget"), (200, "A neat gizmo")]


def test_order_by_lower_expression_with_alias_sibling(spark):
    """join_order_by_alias_expression.out: an index carrying BOTH an
    unaliased lower() expression and an aliased expression over the
    same column still sorts the join page by the lower() expression."""
    contacts = spark.createDataFrame(
        [(1, 1, "amazon")],
        "contact_id int, company_id int, company_name string")
    installs = spark.createDataFrame(
        [(1, 1, "java")],
        "unique_id int, company_id int, technology_name string")
    c_idx = build_index(contacts, IndexSchema(
        key_field="contact_id",
        text_fields=[
            FieldConfig(name="company_name", tokenizer="literal_normalized",
                        source="lower(company_name)",
                        filters=[("ascii_folding",)]),
            FieldConfig(name="cname_alias", source="company_name",
                        tokenizer="keyword"),
        ]))
    t_idx = build_index(installs, IndexSchema(
        key_field="unique_id",
        text_fields=[FieldConfig(name="technology_name")]))
    tm = compile_query(t_idx, ast.Parse("java", field="technology_name")) \
        .select("doc_id")
    ti = installs.join(tm, installs["unique_id"] == tm["doc_id"],
                       "left_semi").alias("ti")
    got = (contacts.alias("c")
           .join(ti, F.col("c.company_id") == F.col("ti.company_id"))
           .select("c.contact_id", "c.company_id", "c.company_name")
           .orderBy(F.lower("c.company_name"), F.col("c.contact_id"))
           .limit(10).collect())
    assert [tuple(r) for r in got] == [(1, 1, "amazon")]
