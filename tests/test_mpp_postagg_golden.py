"""mpp_aggregate_postagg.out result parity (PUBLIC reference behavior,
data replicated inline via the golden's generate_series formulas): a
search-filtered join aggregate is run serially AND through the
distributed (MPP) executor and pins IDENTICAL rows — the grouped
COUNT/SUM/MIN/MAX matrix, a two-key grouping under LIMIT, HAVING with
an aggregate ORDER BY, the bare COUNT(*), and a three-table join
grouped by the dimension name.  The Spark analog runs each query at
two shuffle-partition widths and pins the same rows at both (the
DataFusion DistributedExec plan dumps are executor internals — N/A;
Spark's exchange operators are the analog).

Ref: pg_search/tests/pg_regress/expected/mpp_aggregate_postagg.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def postagg(spark):
    files = spark.range(1, 201).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("file-"), F.col("id")).alias("title"),
        F.concat(F.lit("cat-"), F.col("id") % 5).alias("category"),
        F.concat(F.lit("Section "), F.col("id"),
                 F.lit(" has content for testing")).alias("content"))
    pages = spark.range(1, 1001).select(
        F.col("id").cast("int").alias("id"),
        ((F.col("id") % 200) + 1).cast("int").alias("file_id"),
        ((F.col("id") * 17) % 4096).cast("int").alias("size_bytes"))
    cats = spark.range(0, 5).select(
        (F.col("id") + 1).cast("int").alias("id"),
        F.concat(F.lit("cat-"), F.col("id")).alias("name"),
        F.concat(F.lit("Category "), F.col("id"),
                 F.lit(" Section description")).alias("description"))
    fidx = build_index(files, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title", fast=True),
                     FieldConfig(name="category", fast=True),
                     FieldConfig(name="content")]))
    return fidx, files, pages, cats


def _joined(fidx, files, pages):
    m = compile_query(fidx, ast.Parse("Section", field="content")) \
        .select("doc_id")
    f = files.join(m, files["id"] == m["doc_id"], "left_semi")
    return pages.join(F.broadcast(f), pages["file_id"] == f["id"])


def _both_widths(spark, fn):
    """Run fn() at 1 and 32 shuffle partitions (the golden's serial vs
    MPP passes) and assert identical rows; return them."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    out = {}
    try:
        for n in ("1", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            out[n] = fn()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert out["1"] == out["32"]
    return out["1"]


CAT_MATRIX = [("cat-0", 200, 394380, 4, 4063),
              ("cat-1", 200, 397780, 21, 4080),
              ("cat-2", 200, 396468, 1, 4081),
              ("cat-3", 200, 395772, 2, 4082),
              ("cat-4", 200, 395076, 3, 4083)]


def test_category_agg_matrix(postagg):
    fidx, files, pages, _ = postagg
    spark = files.sparkSession

    def run():
        got = (_joined(fidx, files, pages).groupBy("category")
               .agg(F.count("*").alias("row_count"),
                    F.sum("size_bytes").alias("total_bytes"),
                    F.min("size_bytes").alias("min_bytes"),
                    F.max("size_bytes").alias("max_bytes"))
               .orderBy("category").collect())
        return [(r["category"], r["row_count"], r["total_bytes"],
                 r["min_bytes"], r["max_bytes"]) for r in got]

    assert _both_widths(spark, run) == CAT_MATRIX


def test_two_key_grouping_limit(postagg):
    fidx, files, pages, _ = postagg
    spark = files.sparkSession

    def run():
        got = (_joined(fidx, files, pages)
               .groupBy("category", "title")
               .agg(F.count("*").alias("pages_per_file"))
               .orderBy("category", "title").limit(10).collect())
        return [(r["category"], r["title"], r["pages_per_file"])
                for r in got]

    assert _both_widths(spark, run) == [
        ("cat-0", "file-10", 5), ("cat-0", "file-100", 5),
        ("cat-0", "file-105", 5), ("cat-0", "file-110", 5),
        ("cat-0", "file-115", 5), ("cat-0", "file-120", 5),
        ("cat-0", "file-125", 5), ("cat-0", "file-130", 5),
        ("cat-0", "file-135", 5), ("cat-0", "file-140", 5)]


def test_having_orderby_agg_limit(postagg):
    fidx, files, pages, _ = postagg
    spark = files.sparkSession

    def run():
        got = (_joined(fidx, files, pages).groupBy("category")
               .agg(F.count("*").alias("c"),
                    F.sum("size_bytes").alias("s"))
               .filter(F.col("c") > 100)
               .orderBy(F.col("s").desc()).limit(3).collect())
        return [(r["category"], r["c"], r["s"]) for r in got]

    assert _both_widths(spark, run) == [
        ("cat-1", 200, 397780), ("cat-2", 200, 396468),
        ("cat-3", 200, 395772)]


def test_bare_count(postagg):
    fidx, files, pages, _ = postagg
    spark = files.sparkSession
    assert _both_widths(
        spark, lambda: _joined(fidx, files, pages).count()) == 1000


def test_three_table_join_grouped(postagg):
    fidx, files, pages, cats = postagg
    spark = files.sparkSession

    def run():
        j = (_joined(fidx, files, pages)
             .join(F.broadcast(cats),
                   F.col("category") == cats["name"]))
        got = (j.groupBy("name")
               .agg(F.count("*").alias("row_count"),
                    F.sum("size_bytes").alias("total_bytes"))
               .orderBy("name").collect())
        return [(r["name"], r["row_count"], r["total_bytes"])
                for r in got]

    assert _both_widths(spark, run) == [
        ("cat-0", 200, 394380), ("cat-1", 200, 397780),
        ("cat-2", 200, 396468), ("cat-3", 200, 395772),
        ("cat-4", 200, 395076)]
