"""nested_loop.out + joinscan_null_jri.out goldens (PUBLIC reference
behavior, tables replicated inline):

- ``nested_loop.out`` (issue #2733 repro): a 3-way equijoin with a
  CROSS-TABLE OR of per-side conjunctions — ((orders.id @@@ '3' AND
  orders.color @@@ 'blue') OR (users.color @@@ 'blue' AND users.id
  @@@ '3')) — returns 0 rows: neither side has id 3, so both OR arms
  are empty even though every equijoin key matches.  (The golden's
  plan body pins the reference's DataFusion join tree — planner
  internals, N/A; the pinned RESULT is the empty page.)
- ``joinscan_null_jri.out``: 3-way 100-row join (users.age =
  products.age, products.uuid = orders.uuid) with users.name @@@
  'bob', ORDER BY the three ids LIMIT 1 → exactly (1, 'bob').  In the
  reference this shape exercises a JoinScan-activation gap (NestPath
  sub-join with empty joinrestrictinfo); correctness comes from the
  fallback plan — here the declarative join IS the plan, and the row
  set is the pin.

Ref: pg_search/tests/pg_regress/expected/nested_loop.out
     pg_search/tests/pg_regress/expected/joinscan_null_jri.out
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

KW = [FieldConfig(name="name", tokenizer="keyword"),
      FieldConfig(name="color", tokenizer="keyword")]


def _m(idx, q, tag):
    return (compile_query(idx, q)
            .select(F.col("doc_id").alias(f"{tag}_k")))


def test_nested_loop_cross_table_or_empty(spark):
    users = spark.createDataFrame(
        [(1, "bob", "blue", "20")],
        "id long, name string, color string, age string")
    products = spark.createDataFrame(
        [(1, "bob", "blue")], "id long, name string, color string")
    orders = spark.createDataFrame(
        [(1, "bob", "blue")], "id long, name string, color string")
    u_idx = build_index(users, IndexSchema(key_field="id",
                                           text_fields=list(KW)))
    o_idx = build_index(orders, IndexSchema(key_field="id",
                                            text_fields=list(KW)))
    # per-side conjunctions of the OR
    o_arm = _m(o_idx, ast.Boolean(must=[ast.Parse("3", field="id"),
                                        ast.Parse("blue",
                                                  field="color")]), "o")
    u_arm = _m(u_idx, ast.Boolean(must=[ast.Parse("blue", field="color"),
                                        ast.Parse("3", field="id")]), "u")
    j = (users.alias("u")
         .join(products.alias("p"), F.col("u.name") == F.col("p.name"))
         .join(orders.alias("o"), F.col("p.color") == F.col("o.color"))
         .join(o_arm, F.col("o.id") == F.col("o_k"), "left")
         .join(u_arm, F.col("u.id") == F.col("u_k"), "left")
         .filter(F.col("o_k").isNotNull() | F.col("u_k").isNotNull())
         .select("u.name", "u.color", "u.age")
         .limit(10))
    assert j.collect() == []


def test_joinscan_null_jri_first_bob(spark):
    names = ["alice", "bob", "cloe"]
    rows = [(i, names[i % 3], (i % 100) + 1,
             hashlib.md5(str(i).encode()).hexdigest())
            for i in range(1, 101)]
    schema = "id long, name string, age int, uuid string"
    users = spark.createDataFrame(rows, schema)
    products = spark.createDataFrame(rows, schema)
    orders = spark.createDataFrame(rows, schema)
    u_idx = build_index(users, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword"),
                     FieldConfig(name="uuid", tokenizer="keyword")],
        numeric_fields=["age"]))
    m = _m(u_idx, ast.Parse("bob", field="name"), "u")
    j = (users.alias("u")
         .join(m, F.col("u.id") == F.col("u_k"), "left_semi")
         .join(products.alias("p"), F.col("u.age") == F.col("p.age"))
         .join(orders.alias("o"), F.col("p.uuid") == F.col("o.uuid"))
         .orderBy("u.id", "p.id", "o.id")
         .select(F.col("u.id").alias("id"), F.col("u.name").alias("name"))
         .limit(1))
    assert [tuple(r) for r in j.collect()] == [(1, "bob")]
