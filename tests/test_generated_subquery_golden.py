"""generated_subquery_proptest_failure.out golden (PUBLIC reference
behavior): a proptest-generated shape — ``color IN (SELECT color FROM
orders WHERE NOT (age @@@ '20') ORDER BY id LIMIT 9) AND name @@@
'bob' AND name @@@ 'bob'`` (duplicate predicate) over two 11-row
keyword-indexed tables, each built from two insert batches (two
segments) — must count 3 on both the plain-SQL and the search path.

Ref: pg_search/tests/pg_regress/expected/
generated_subquery_proptest_failure.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import insert_docs, open_segmented_index

PRODUCTS = [
    (1, "bob", "blue", "20"), (2, "sally", "red", "12"),
    (3, "brandy", "orange", "63"), (4, "bob", "yellow", "95"),
    (5, "cloe", "blue", "90"), (6, "brandy", "orange", "41"),
    (7, "cloe", "purple", "53"), (8, "sally", "purple", "63"),
    (9, "cloe", "blue", "27"), (10, "bob", "red", "23"),
    (11, "cloe", "blue", "60")]
ORDERS = [
    (1, "bob", "blue", "20"), (2, "anchovy", "red", "42"),
    (3, "bob", "green", "20"), (4, "brisket", "orange", "92"),
    (5, "anchovy", "yellow", "46"), (6, "brisket", "green", "6"),
    (7, "brandy", "red", "34"), (8, "anchovy", "purple", "48"),
    (9, "alice", "purple", "22"), (10, "alice", "purple", "52"),
    (11, "sally", "blue", "21")]

KW = dict(tokenizer="keyword")


def _build(spark, tdir, name, rows):
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="name", **KW),
                                      FieldConfig(name="color", **KW),
                                      FieldConfig(name="age", **KW)])
    df = spark.createDataFrame(
        rows, "id string, name string, color string, age string")
    # two insert batches → two segments, the trigger shape
    insert_docs(spark, f"{tdir}/{name}", df.filter(F.col("id") == "1"),
                schema)
    insert_docs(spark, f"{tdir}/{name}", df.filter(F.col("id") != "1"),
                schema)
    return open_segmented_index(spark, f"{tdir}/{name}", schema,
                                docs=df), df


def test_in_subquery_with_not_and_duplicate_predicates(spark, tmp_path):
    tdir = str(tmp_path)
    p_idx, products = _build(spark, tdir, "products", PRODUCTS)
    o_idx, orders = _build(spark, tdir, "orders", ORDERS)

    # plain-SQL twin
    sub = (orders.filter(F.col("age") != "20")
           .orderBy(F.col("id").cast("long")).limit(9)
           .select("color").distinct())
    plain = (products.filter(F.col("name") == "bob")
             .join(sub, "color", "left_semi").count())
    assert plain == 3

    # search path: NOT (age @@@ '20') via must_not, name @@@ 'bob' twice
    not20 = compile_query(o_idx, ast.Boolean(
        must=[ast.All()],
        must_not=[ast.Parse("20", field="age")])).select("doc_id")
    sub_colors = (orders.join(not20, orders["id"] == F.col("doc_id"),
                              "left_semi")
                  .orderBy(F.col("id").cast("long")).limit(9)
                  .select("color").distinct())
    bob = compile_query(p_idx, ast.Boolean(
        must=[ast.Parse("bob", field="name"),
              ast.Parse("bob", field="name")])).select("doc_id")
    got = (products.join(bob, products["id"] == F.col("doc_id"),
                         "left_semi")
           .join(sub_colors, "color", "left_semi").count())
    assert got == 3
