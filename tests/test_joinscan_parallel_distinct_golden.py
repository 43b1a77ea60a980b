"""joinscan_parallel_distinct.out + custom_scan_is_numeric_fast_field_
capable.out goldens (PUBLIC reference behavior).

- joinscan_parallel_distinct: a 3-way DISTINCT search join (users ⋈id
  products ⋈age orders, both name @@@ 'bob') with ORDER BY + LIMIT 48
  must return 48 distinct rows regardless of how the intermediate join
  is parallelized (the reference bug was a Sort wrapper blocking path
  reconstruction; Spark's exchange/sort wrappers are Catalyst's
  business, so result parity IS the invariant).
- custom_scan_is_numeric_fast_field_capable: aggregates over an
  ordered search subquery — count 8, max(id) 11, and a constant
  projection max(myid) = 12.

Ref: pg_search/tests/pg_regress/expected/{joinscan_parallel_distinct,
custom_scan_is_numeric_fast_field_capable}.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import insert_docs, open_segmented_index


def _tbl(spark, tdir, name):
    schema = IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword")],
        numeric_fields=["age"])
    i = F.col("id")
    full = spark.range(1, 101).select(
        i.cast("string").alias("id"),
        F.when(i % 2 == 0, "bob").otherwise("alice").alias("name"),
        i.alias("age"))
    # two insert batches → two segments (the golden's
    # global_mutable_segment_rows = 0 split)
    insert_docs(spark, f"{tdir}/{name}",
                full.filter(F.col("age") <= 50), schema)
    insert_docs(spark, f"{tdir}/{name}",
                full.filter(F.col("age") > 50), schema)
    return open_segmented_index(spark, f"{tdir}/{name}", schema,
                                docs=full), full


def test_three_way_distinct_join_limit(spark, tmp_path):
    tdir = str(tmp_path)
    u_idx, users = _tbl(spark, tdir, "users")
    p_idx, products = _tbl(spark, tdir, "products")
    o_idx, orders = _tbl(spark, tdir, "orders")

    ub = users.join(compile_query(u_idx, ast.Parse("bob", field="name"))
                    .select("doc_id"),
                    users["id"] == F.col("doc_id"), "left_semi")
    pb = products.join(compile_query(p_idx,
                                     ast.Parse("bob", field="name"))
                       .select("doc_id"),
                       products["id"] == F.col("doc_id"), "left_semi")
    j = (ub.select(F.col("id").alias("uid"),
                   F.col("name").alias("uname"))
         .join(pb.select(F.col("id").alias("pid"),
                         F.col("age").alias("page")),
               F.col("uid") == F.col("pid"))
         .join(orders.select(F.col("id").alias("oid"),
                             F.col("age").alias("oage")),
               F.col("page") == F.col("oage")))
    got = (j.select("uid", "uname", "pid", "oid").distinct()
           .orderBy(F.col("uid").cast("long"),
                    F.col("pid").cast("long"),
                    F.col("oid").cast("long"))
           .limit(48).collect())
    assert len(got) == 48
    # bob = even ids; age==id makes the 3-way chain 1:1, so the page is
    # ids 2,4,...,96 with uname 'bob' and pid == oid == uid
    assert [int(r["uid"]) for r in got] == list(range(2, 98, 2))
    assert all(r["uname"] == "bob" and r["uid"] == r["pid"] == r["oid"]
               for r in got)


# --- custom_scan_is_numeric_fast_field_capable --------------------------------

ROWS = [("beer wine cheese a", 1), ("beer wine a", 2),
        ("beer cheese a", 3), ("beer a", 4), ("wine cheese a", 5),
        ("wine a", 6), ("cheese a", 7)] * 2


def test_aggregate_over_ordered_search_subquery(spark):
    from sparksearch import build_index
    docs = spark.createDataFrame(
        [(i + 1, m, s) for i, (m, s) in enumerate(ROWS)],
        "id long, message string, severity int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="message")],
        numeric_fields=["severity"]))
    m = compile_query(idx, ast.Parse("beer", field="message")) \
        .select("doc_id")
    sub = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .orderBy("severity"))
    r = sub.agg(F.count("*").alias("c"), F.max("id").alias("mx")).first()
    assert (r["c"], r["mx"]) == (8, 11)
    r2 = (sub.select(F.lit(12).alias("myid"))
          .agg(F.count("*").alias("c"), F.max("myid").alias("mx"))
          .first())
    assert (r2["c"], r2["mx"]) == (8, 12)
