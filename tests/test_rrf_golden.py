"""reciprocal_rank_fusion.out golden (PUBLIC reference behavior):
RRF across two BM25 indexes joined through a foreign key —

    order_search:   top-20 orders by score(customer_name ||| 'Johnson'),
                    RANK() over score desc
    product_search: top-20 items by score(description ||| 'running shoes'),
                    joined to orders on product_id, RANK() over item score
    rrf:            sum(1/(60+rank)) per order_id, top 5

The expected fusion scores are exact rational sums of 1/(60+rank) —
0.032786885... = 1/61 + 1/61 (rank 1 in both lists), 0.030282331... =
1/61 + 1/72 (product rank 12), 0.016393442... = 1/61 (one list only) —
so this golden pins the *rank* semantics (RANK ties across equal BM25
scores, rank evaluated over post-join order rows) rather than raw score
magnitudes.  Ref: pg_search/tests/pg_regress/expected/
reciprocal_rank_fusion.out (PREPARE rrf_query + EXECUTE, lines 30-135).
"""

import pytest
from pyspark.sql import Window, functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import (mock_items, mock_items_index_schema,
                                  mock_orders)
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

K = 60
WANT = [
    (3, "Alice Johnson", "Sleek running shoes", 1 / 61 + 1 / 61),
    (6, "Alice Johnson", "White jogging shoes", 1 / 61 + 1 / 72),
    (36, "Alice Johnson", "White jogging shoes", 1 / 61 + 1 / 72),
    (9, "Chris Wilson", "Sleek running shoes", 1 / 61),
    (25, "Peter Parker", "Sleek running shoes", 1 / 61),
]


def test_rrf_join_golden(spark, tmp_path):
    items = mock_items(spark)
    orders = mock_orders(spark)
    items_idx = build_index(items, mock_items_index_schema())
    orders_idx = build_index(orders, IndexSchema(
        key_field="order_id",
        text_fields=[FieldConfig(name="customer_name")]))

    # order_search: customer_name ||| 'Johnson', top 20 by score,
    # RANK() over score desc (ties share a rank: the three identical
    # 'Alice Johnson' rows must all land on rank 1).
    o = (compile_query(orders_idx,
                       ast.Match("customer_name", "Johnson"))
         .orderBy(F.desc("score"), "doc_id").limit(20)
         .select(F.col("doc_id").alias("order_id"), "score"))
    o_rank = o.select(
        "order_id",
        F.rank().over(Window.orderBy(F.desc("score"))).alias("rank"))

    # product_search: description ||| 'running shoes' top 20, joined to
    # orders on product_id; RANK() evaluated over the *joined* rows.
    m = (compile_query(items_idx,
                       ast.Match("description", "running shoes"))
         .orderBy(F.desc("score"), "doc_id").limit(20)
         .select(F.col("doc_id").alias("pid"), "score"))
    p = orders.join(m, orders["product_id"] == F.col("pid")) \
              .select("order_id", "score")
    p_rank = p.select(
        "order_id",
        F.rank().over(Window.orderBy(F.desc("score"))).alias("rank"))

    rrf = (o_rank.unionAll(p_rank)
           .select("order_id",
                   (F.lit(1.0) / (K + F.col("rank"))).alias("s"))
           .groupBy("order_id").agg(F.sum("s").alias("score")))
    out = (rrf
           .join(orders.select("order_id", "product_id",
                               "customer_name"), "order_id")
           .join(items.select(F.col("id").alias("product_id"),
                              "description"), "product_id")
           .select("order_id", "customer_name", "description", "score")
           .orderBy(F.desc("score"), "order_id").limit(5))

    got = [(r["order_id"], r["customer_name"], r["description"],
            r["score"]) for r in out.collect()]
    assert [(g[0], g[1], g[2]) for g in got] == \
        [(w[0], w[1], w[2]) for w in WANT]
    for g, w in zip(got, WANT):
        assert g[3] == pytest.approx(w[3], rel=1e-12), g
