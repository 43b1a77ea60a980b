"""mpp_join_topk_ffhelper.out result parity (PUBLIC reference behavior,
data replicated inline via the golden's generate_series formulas): an
IN-subquery semi-join whose inner side is a two-field ``|||``
(disjunction match) search over a MULTI-SEGMENT users index, with a
string TopK (ORDER BY title ASC LIMIT 25) over 50k posts — pinned ids
1..25, identical in the serial and MPP passes.  The Spark analog runs
at two shuffle widths; the users index is built as two streamed
segments (the golden's two INSERT batches under
target_segment_count=8) so the match set crosses a segment boundary.

Ref: pg_search/tests/pg_regress/expected/mpp_join_topk_ffhelper.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import insert_docs, open_segmented_index


@pytest.fixture(scope="module")
def topk_ff(spark, tmp_path_factory):
    def users(lo, hi):
        return spark.range(lo, hi + 1).select(
            F.col("id").cast("int").alias("id"),
            F.lit("about java code").alias("about_me"),
            F.lit("David John Alex").alias("display_name"))
    posts = spark.range(1, 50001).select(
        F.col("id").cast("int").alias("id"),
        ((F.col("id") % 5000) + 1).cast("int").alias("owner_user_id"),
        F.concat(F.lit("title "), F.lpad(F.col("id").cast("string"), 6, "0"),
                 F.lit(" code")).alias("title"))
    schema = IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="about_me"),
                     FieldConfig(name="display_name", fast=True)])
    path = str(tmp_path_factory.mktemp("mpp_topk") / "users_idx")
    insert_docs(spark, path, users(1, 2500), schema)
    insert_docs(spark, path, users(2501, 5000), schema)
    uidx = open_segmented_index(spark, path, schema,
                                docs=users(1, 5000))
    return uidx, posts


EXPECT = [(i, f"title {i:06d} code") for i in range(1, 26)]


def test_in_subquery_topk_two_widths(topk_ff):
    uidx, posts = topk_ff
    spark = posts.sparkSession
    q = ast.Boolean(must=[ast.Match("about_me", "java"),
                          ast.Match("display_name", "David")])
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    out = {}
    try:
        for n in ("1", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            m = compile_query(uidx, q).select(
                F.col("doc_id").alias("uid"))
            got = (posts.join(F.broadcast(m),
                              posts["owner_user_id"] == F.col("uid"),
                              "left_semi")
                   .select("id", "title")
                   .orderBy(F.col("title").asc()).limit(25).collect())
            out[n] = [(r["id"], r["title"]) for r in got]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert out["1"] == out["32"] == EXPECT
