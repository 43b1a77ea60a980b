"""joinscan_sortby_score.out golden (PUBLIC reference behavior,
tables replicated inline): a 3-way join with per-table BM25 scores
SUMMED across all three sides and ORDER BY that sum — the combined
score 3.2872329 is float32-exact on both surviving rows.

Ref: pg_search/tests/pg_regress/expected/joinscan_sortby_score.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def tri(spark):
    documents = spark.createDataFrame(
        [("doc-1", "project alpha notes",
          "Document about project alpha", "Alpha Doc"),
         ("doc-2", "project beta notes",
          "Document about project beta", "Beta Doc")],
        "id string, parents string, content string, title string")
    files = spark.createDataFrame(
        [("file-1", "doc-1", "File content for alpha",
          "collab12 alpha file"),
         ("file-2", "doc-1", "File content misc", "collab12 misc file"),
         ("file-3", "doc-2", "File content for beta", "beta file")],
        "id string, documentId string, content string, title string")
    pages = spark.createDataFrame(
        [("page-1", "file-1", "Single Number Reach configuration",
          "Page A"),
         ("page-2", "file-1", "Other page content", "Page B"),
         ("page-3", "file-2", "Single Number Reach details", "Page C"),
         ("page-4", "file-3", "Beta page content", "Page D")],
        "id string, fileId string, content string, title string")

    def idx(docs, fields):
        return build_index(docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name=f) for f in fields]))
    return ((documents, idx(documents, ["content", "title", "parents"])),
            (files, idx(files, ["content", "title"])),
            (pages, idx(pages, ["content", "title"])))


def test_three_way_summed_scores(tri):
    (documents, didx), (files, fidx), (pages, pidx) = tri
    dm = compile_query(didx, ast.Parse("project alpha",
                                       field="parents")) \
        .select(F.col("doc_id").alias("d_id"),
                F.col("score").alias("d_score"))
    fm = compile_query(fidx, ast.Parse("collab12", field="title")) \
        .select(F.col("doc_id").alias("f_id"),
                F.col("score").alias("f_score"))
    pm = compile_query(pidx, ast.Parse("Single Number Reach",
                                       field="content")) \
        .select(F.col("doc_id").alias("p_id"),
                F.col("score").alias("p_score"))
    j = (documents.alias("d").join(dm, F.col("d.id") == F.col("d_id"))
         .join(files.alias("f"),
               F.col("d.id") == F.col("f.documentId"))
         .join(fm, F.col("f.id") == F.col("f_id"))
         .join(pages.alias("p"), F.col("p.fileId") == F.col("f.id"))
         .join(pm, F.col("p.id") == F.col("p_id"))
         .withColumn("score",
                     (F.col("d_score") + F.col("f_score")
                      + F.col("p_score")).cast("float").cast("double")))
    rows = (j.orderBy(F.col("score").desc(), F.col("p.id").asc())
            .limit(1000)
            .select(F.col("d.id").alias("doc"),
                    F.col("f.id").alias("file"),
                    F.col("p.id").alias("page"), "score").collect())
    want = np.float32("3.2872329")
    assert [(r["doc"], r["file"], r["page"], np.float32(r["score"]))
            for r in rows] == [
        ("doc-1", "file-1", "page-1", want),
        ("doc-1", "file-2", "page-3", want)]
