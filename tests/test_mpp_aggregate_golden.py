"""mpp_aggregate.out result parity (PUBLIC reference behavior, data
replicated inline via the golden's generate_series formulas): the
reference runs a search-filtered join aggregate single-node AND through
its distributed (MPP, 2-task) executor and pins IDENTICAL results —
COUNT(*)=1000 and the grouped top-5 (count, sum) rows.  The Spark
analog runs the same plan at two shuffle-partition widths: result
equality across parallelism is the same invariant the golden's
single-vs-distributed sections pin.  (The golden's DataFusion
DistributedExec plan shapes are executor internals — N/A here; Spark's
exchange operators are the analog.)

Ref: pg_search/tests/pg_regress/expected/mpp_aggregate.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def mpp(spark):
    files = spark.range(1, 201).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("file-"), F.col("id")).alias("title"),
        F.concat(F.lit("Section "), F.col("id"),
                 F.lit(" has content for testing")).alias("content"))
    pages = spark.range(1, 1001).select(
        F.col("id").cast("int").alias("id"),
        ((F.col("id") % 200) + 1).cast("int").alias("file_id"),
        F.concat(F.lit("Page text for page "), F.col("id"))
        .alias("page_text"),
        ((F.col("id") * 17) % 4096).cast("int").alias("size_bytes"))
    fidx = build_index(files, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title", fast=True),
                     FieldConfig(name="content")]))
    return fidx, files, pages


def _agg(fidx, files, pages):
    m = compile_query(fidx, ast.Parse("Section", field="content")) \
        .select("doc_id")
    f = files.join(m, files["id"] == m["doc_id"], "left_semi")
    j = pages.join(F.broadcast(f), pages["file_id"] == f["id"])
    return j


def test_join_count(mpp):
    fidx, files, pages = mpp
    assert _agg(fidx, files, pages).count() == 1000


def test_grouped_topk(mpp):
    fidx, files, pages = mpp
    got = (_agg(fidx, files, pages)
           .groupBy("title")
           .agg(F.count("*").alias("count"),
                F.sum("size_bytes").alias("sum"))
           .orderBy("title").limit(5).collect())
    assert [(r["title"], r["count"], r["sum"]) for r in got] == [
        ("file-1", 5, 10040), ("file-10", 5, 10189),
        ("file-100", 5, 9647), ("file-101", 5, 9732),
        ("file-102", 5, 9817)]


INNER_TOP10 = [
    ("file-1", 616), ("file-1", 1312), ("file-1", 2008),
    ("file-1", 2704), ("file-1", 3400), ("file-10", 153),
    ("file-10", 1465), ("file-10", 2161), ("file-10", 2857),
    ("file-10", 3553)]


def test_joinscan_projection_top10(mpp):
    """mpp_joinscan.out: project through the join under a LIMIT —
    pinned rows, identical in the serial and MPP passes."""
    fidx, files, pages = mpp
    got = (_agg(fidx, files, pages)
           .select("title", "size_bytes")
           .orderBy("title", "size_bytes").limit(10).collect())
    assert [(r["title"], r["size_bytes"]) for r in got] == INNER_TOP10


def test_joinscan_heap_filter_length(mpp):
    """mpp_joinscan.out: extra non-indexed qual length(title) > 6."""
    fidx, files, pages = mpp
    got = (_agg(fidx, files, pages)
           .filter(F.length("title") > 6)
           .select("title", "size_bytes")
           .orderBy("title", "size_bytes").limit(10).collect())
    assert [(r["title"], r["size_bytes"]) for r in got] == [
        ("file-10", 153), ("file-10", 1465), ("file-10", 2161),
        ("file-10", 2857), ("file-10", 3553), ("file-100", 291),
        ("file-100", 987), ("file-100", 1683), ("file-100", 2995),
        ("file-100", 3691)]


def test_joinscan_left_join(mpp):
    """mpp_joinscan.out LEFT JOIN section: every matched file has pages,
    so the null-extended join returns the same top-10 as the inner."""
    fidx, files, pages = mpp
    m = compile_query(fidx, ast.Parse("Section", field="content")) \
        .select("doc_id")
    f = files.join(m, files["id"] == m["doc_id"], "left_semi")
    j = f.join(pages, f["id"] == pages["file_id"], "left")
    got = (j.select("title", "size_bytes")
           .orderBy("title", "size_bytes").limit(10).collect())
    assert [(r["title"], r["size_bytes"]) for r in got] == INNER_TOP10


def test_parallelism_invariance(mpp):
    # single-node vs distributed parity: same results at 1 and 32
    # shuffle partitions (the golden's non-MPP vs MPP sections)
    fidx, files, pages = mpp
    spark = files.sparkSession
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    rows = {}
    try:
        for n in ("1", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = sorted(
                (r["title"], r["count"], r["sum"]) for r in
                _agg(fidx, files, pages).groupBy("title")
                .agg(F.count("*").alias("count"),
                     F.sum("size_bytes").alias("sum")).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert rows["1"] == rows["32"] and len(rows["1"]) == 200
