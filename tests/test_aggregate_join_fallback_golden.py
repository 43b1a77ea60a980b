"""aggregate_join_fallback.out golden (PUBLIC reference behavior):
aggregate-on-join shapes over the fb_products / fb_tags / fb_reviews
corpus — both the supported DataFusion shapes and the fallback shapes
must return the same rows (the golden runs each twice, custom scan
on/off; here both are one Catalyst plan, so result parity IS the
assertion).

- 3-table join + COUNT(*) over 'laptop' → 2
- GROUP BY category with COUNT/SUM (→ 1b) and the five-aggregate form
- tag-chain GROUP BY tag_name (1f)
- LEFT JOIN counts (1g)
- CROSS JOIN (the reference's fallback shape) → 3
- HAVING COUNT(*) > 0 (test 3) → three categories

Ref: pg_search/tests/pg_regress/expected/aggregate_join_fallback.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [(1, "Laptop computer fast", "Electronics", 999.99),
            (2, "Running shoes light", "Sports", 89.99),
            (3, "Winter jacket warm", "Clothing", 129.99)]
TAGS = [(1, 1, "tech"), (2, 2, "fitness"), (3, 3, "outdoor")]
REVIEWS = [(1, 1, 5), (2, 1, 4), (3, 2, 3), (4, 3, 4)]


@pytest.fixture(scope="module")
def fb(spark):
    p = spark.createDataFrame(
        PRODUCTS, "id long, description string, category string, "
                  "price double")
    t = spark.createDataFrame(TAGS,
                              "id long, product_id long, tag_name string")
    r = spark.createDataFrame(REVIEWS,
                              "id long, product_id long, rating int")
    p_idx = build_index(p, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category", tokenizer="keyword")],
        numeric_fields=["price"]))
    return p, t, r, p_idx


def _matched(fb_fix, qstr):
    p, t, r, p_idx = fb_fix
    m = compile_query(p_idx, ast.Parse(qstr, field="description")) \
        .select("doc_id")
    return p.join(m, p["id"] == m["doc_id"], "left_semi")


def test_1_three_table_count(fb):
    p, t, r, _ = fb
    mp = _matched(fb, "laptop")
    got = (mp.join(t.select(F.col("product_id").alias("tp")),
                   mp["id"] == F.col("tp"))
           .join(r.select(F.col("product_id").alias("rp")),
                 mp["id"] == F.col("rp")).count())
    assert got == 2


ALL3 = "laptop OR shoes OR jacket"


def test_1b_group_by_with_count_sum(fb):
    p, t, r, _ = fb
    mp = _matched(fb, ALL3)
    j = (mp.join(t.select(F.col("product_id").alias("tp")),
                 mp["id"] == F.col("tp"))
         .join(r.select(F.col("product_id").alias("rp"), "rating"),
               mp["id"] == F.col("rp")))
    got = (j.groupBy("category")
           .agg(F.count("*").alias("count"), F.sum("rating").alias("sum"))
           .orderBy("category").collect())
    assert [(x["category"], x["count"], x["sum"]) for x in got] == \
        [("Clothing", 1, 4), ("Electronics", 2, 9), ("Sports", 1, 3)]
    # 1d: the five-aggregate form over the same join
    five = (j.groupBy("category")
            .agg(F.count("*").alias("c"), F.sum("rating").alias("s"),
                 F.avg("rating").alias("a"), F.min("rating").alias("mn"),
                 F.max("rating").alias("mx"))
            .filter(F.col("category") == "Electronics").first())
    assert (five["c"], five["s"], five["a"], five["mn"], five["mx"]) == \
        (2, 9, 4.5, 4, 5)


def test_1f_tag_chain_group_by(fb):
    p, t, r, _ = fb
    mp = _matched(fb, ALL3)
    j = (mp.join(t.select(F.col("product_id").alias("tp"), "tag_name"),
                 mp["id"] == F.col("tp"))
         .join(r.select(F.col("product_id").alias("rp"), "rating"),
               mp["id"] == F.col("rp")))
    got = (j.groupBy("tag_name")
           .agg(F.count("*").alias("count"), F.sum("rating").alias("sum"))
           .orderBy("tag_name").collect())
    assert [(x["tag_name"], x["count"], x["sum"]) for x in got] == \
        [("fitness", 1, 3), ("outdoor", 1, 4), ("tech", 2, 9)]


def test_1g_left_join_counts(fb):
    p, t, r, _ = fb
    mp = _matched(fb, ALL3)
    j = (mp.join(t.select(F.col("product_id").alias("tp")),
                 mp["id"] == F.col("tp"), "left")
         .join(r.select(F.col("product_id").alias("rp"), "rating"),
               mp["id"] == F.col("rp"), "left"))
    got = (j.groupBy("category")
           .agg(F.count("*").alias("c_star"),
                F.count("rating").alias("c_rating"))
           .orderBy("category").collect())
    assert [(x["category"], x["c_star"], x["c_rating"]) for x in got] == \
        [("Clothing", 1, 1), ("Electronics", 2, 2), ("Sports", 1, 1)]


def test_2_cross_join_fallback(fb):
    p, t, r, _ = fb
    got = _matched(fb, "laptop").crossJoin(t).count()
    assert got == 3


def test_3_having(fb):
    p, t, r, _ = fb
    mp = _matched(fb, ALL3)
    j = mp.join(t.select(F.col("product_id").alias("tp")),
                mp["id"] == F.col("tp"))
    got = (j.groupBy("category").agg(F.count("*").alias("count"))
           .filter(F.col("count") > 0)
           .orderBy("category").collect())
    assert [(x["category"], x["count"]) for x in got] == \
        [("Clothing", 1), ("Electronics", 1), ("Sports", 1)]
