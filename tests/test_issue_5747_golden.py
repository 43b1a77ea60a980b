"""issue_5747.out golden (PUBLIC reference behavior): a search-driven
join between two indexes with DIFFERENT physical segment counts — the
reference bug was a DataFusion partition-count mismatch; the invariant
is that the join result is independent of each side's segment layout.
pc_big (80 rows over TWO segments: 50 'active' + 30 'merged') joined
to pc_small (80 rows, ONE segment) on ``le.series_id = sv.id`` with
term filters on both sides, ORDER BY le.id LIMIT 5 → ids 51..55.

Ref: pg_search/tests/pg_regress/expected/issue_5747.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import insert_docs, open_segmented_index


def test_join_across_unequal_segment_counts(spark, tmp_path):
    tdir = str(tmp_path)
    big_schema = IndexSchema(key_field="id",
                             text_fields=[FieldConfig(name="state")])
    small_schema = IndexSchema(key_field="id",
                               text_fields=[FieldConfig(name="user_id")],
                               numeric_fields=["series_id"])

    # pc_big: two INSERT statements → two immutable segments
    b1 = (spark.range(1, 51).select(F.col("id").cast("string").alias("id"),
                                    F.lit("active").alias("state")))
    b2 = (spark.range(51, 81).select(F.col("id").cast("string").alias("id"),
                                     F.lit("merged").alias("state")))
    insert_docs(spark, f"{tdir}/big", b1, big_schema)
    insert_docs(spark, f"{tdir}/big", b2, big_schema)
    big_docs = b1.unionByName(b2)
    big = open_segmented_index(spark, f"{tdir}/big", big_schema,
                               docs=big_docs)

    # pc_small: one statement → one segment
    s1 = (spark.range(1, 81).select(F.col("id").cast("string").alias("id"),
                                    F.col("id").cast("long")
                                    .alias("series_id"),
                                    F.lit("u1").alias("user_id")))
    insert_docs(spark, f"{tdir}/small", s1, small_schema)
    small = open_segmented_index(spark, f"{tdir}/small", small_schema,
                                 docs=s1)

    from sparksearch.streaming.indexer import _committed_segments
    assert len(_committed_segments(f"{tdir}/big")) == 2
    assert len(_committed_segments(f"{tdir}/small")) == 1

    le = (s1.join(compile_query(small, ast.Term("user_id", "u1"))
                  .select("doc_id"),
                  s1["id"] == F.col("doc_id"), "left_semi"))
    sv = (big_docs.join(compile_query(big, ast.Term("state", "merged"))
                        .select(F.col("doc_id").alias("__d")),
                        big_docs["id"] == F.col("__d"), "left_semi"))
    got = (le.join(sv.select(F.col("id").alias("sv_id")),
                   le["series_id"] == F.col("sv_id").cast("long"))
           .select(le["id"].cast("long").alias("id"))
           .orderBy("id").limit(5).collect())
    assert [r["id"] for r in got] == [51, 52, 53, 54, 55]
