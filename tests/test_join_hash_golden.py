"""join_hash.out golden (PUBLIC reference behavior): hash-join row
pages through the join scan, including the sorted-FK-segment corpus
(issue #4895).

The reference's EXPLAIN tokens (dynamic_filter_pushdown=gallop /
linear / bitset…) are per-strategy dispatch of the SAME row contract —
on Spark that choice belongs to Catalyst/AQE (broadcast-IN vs shuffled
hash join), so the tokens are N/A; the golden's row pages are the
portable contract, and the reference itself asserts both dispatch
outcomes return identical rows (its tests 2a vs 2b).

- Test 1: 1000×1000, t2.t1_id a permutation of t1.id → the page pairs
  'val k' with 'val (k-1 mod 1000)'.
- Test 2: 1500×2000 with t1_id cycling 1..1500 (keys 1..500 hit
  twice), inner index sort_by t1_id — same page whether or not the
  inner is sorted.  The reference's within-key pair order is unstable;
  the engine pins the deterministic (t1.id, t2.id) order.

Ref: pg_search/tests/pg_regress/expected/join_hash.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _mk(spark, n1, n2, fk_expr, sort_by=None):
    i = F.col("id")
    t1 = spark.range(1, n1 + 1).select(
        i.cast("int").alias("id"),
        F.concat(F.lit("val "), i).alias("val"))
    t2 = spark.range(1, n2 + 1).select(
        i.cast("int").alias("id"), fk_expr(i).cast("int").alias("t1_id"),
        F.concat(F.lit("val "), i).alias("val"))
    t1_idx = build_index(t1, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="val", fast=True)]))
    # the golden sorts the INNER index by the FK column (issue #4895's
    # gallop-shaped segments); probe through its docs either way
    t2_idx = build_index(t2, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="val", fast=True)],
        numeric_fields=["t1_id"], sort_by=sort_by))
    return t1, t2_idx.docs, t1_idx


def _page(t1, t2, t1_idx):
    m = compile_query(t1_idx, ast.Parse("val", field="val")) \
        .select(F.col("doc_id").alias("mid"))
    j = (t1.join(m, t1["id"] == F.col("mid"), "left_semi")
           .join(t2.select(F.col("id").alias("t2id"),
                           F.col("t1_id"),
                           F.col("val").alias("t2val")),
                 t1["id"] == F.col("t1_id"))
           .orderBy(t1["id"].asc(), F.col("t2id").asc())
           .limit(10)
           .select(t1["val"], F.col("t2val")))
    return [(r["val"], r["t2val"]) for r in j.collect()]


def test_1_hash_join_page(spark):
    t1, t2, t1_idx = _mk(spark, 1000, 1000, lambda i: (i % 1000) + 1)
    want = [("val 1", "val 1000")] + \
        [(f"val {k}", f"val {k - 1}") for k in range(2, 11)]
    assert _page(t1, t2, t1_idx) == want


@pytest.mark.parametrize("sort_by", [None, "t1_id asc"])
def test_2_sorted_fk_segment_page(spark, sort_by):
    """Keys 1..500 appear twice (rows k and k+1500); identical page
    regardless of inner-sort / dispatch strategy."""
    t1, t2, t1_idx = _mk(spark, 1500, 2000,
                         lambda i: ((i - 1) % 1500) + 1, sort_by=sort_by)
    want = []
    for k in range(1, 6):
        want += [(f"val {k}", f"val {k}"), (f"val {k}", f"val {k + 1500}")]
    assert _page(t1, t2, t1_idx) == want
