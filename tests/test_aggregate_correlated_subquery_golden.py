"""aggregate_correlated_subquery.out golden (PUBLIC reference
behavior, tables replicated inline): correlated COUNT(*) subqueries
over search scans — the `(SELECT COUNT(*) FROM files f WHERE
f.documentId = d.id AND <pred>)` per-row counter — expressed Spark-side
as one grouped count left-joined back (NO per-row re-scan; the
reference's aggregate custom scan batches these the same way).  Covers
search-filtered, non-indexed-filtered, empty, and unfiltered inner
predicates.

Ref: pg_search/tests/pg_regress/expected/aggregate_correlated_subquery.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

DOCS = [
    ("doc1", "Invoice 2023",
     "This is an invoice for services rendered in 2023", "Factures"),
    ("doc2", "Receipt 2023",
     "This is a receipt for payment received in 2023", "Factures"),
    ("doc3", "Contract 2023",
     "This is a contract for services in 2023", "Contracts"),
]
FILES = [
    ("file1", "doc1", "Invoice PDF", "/invoices/2023.pdf", 1024),
    ("file2", "doc1", "Invoice Receipt", "/invoices/2023_receipt.pdf",
     512),
    ("file3", "doc2", "Receipt", "/receipts/2023.pdf", 256),
    ("file4", "doc3", "Contract Document", "/contracts/2023.pdf", 2048),
]


@pytest.fixture(scope="module")
def fx(spark):
    documents = spark.createDataFrame(
        DOCS, "id string, title string, content string, parents string")
    files = spark.createDataFrame(
        FILES, "id string, documentId string, title string, "
        "file_path string, file_size int")
    d_idx = build_index(documents, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="parents"),
                                     FieldConfig(name="content")]))
    f_idx = build_index(files, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="documentId", tokenizer="keyword"),
                     FieldConfig(name="title"),
                     FieldConfig(name="file_path")]))
    return documents, files, d_idx, f_idx


def _correlated_counts(fx, outer_q, inner):
    """documents matching outer_q, each with COUNT(*) of `inner` files
    grouped by documentId and left-joined back (the batched correlated
    subquery shape)."""
    documents, files, d_idx, _ = fx
    m = compile_query(d_idx, outer_q).select("doc_id")
    d = documents.join(m, documents["id"] == m["doc_id"], "left_semi")
    counts = (inner.groupBy("documentId")
              .agg(F.count("*").alias("n"))
              .withColumnRenamed("documentId", "did"))
    out = (d.join(counts, d["id"] == F.col("did"), "left")
           .select("id", "title",
                   F.coalesce("n", F.lit(0)).alias("n"))
           .orderBy("id"))
    return [(r["id"], r["title"], r["n"]) for r in out.collect()]


FACTURES = ast.Parse("Factures", field="parents")


def test_1_and_2_search_filtered_count(fx):
    _, files, _, f_idx = fx
    fm = compile_query(f_idx, ast.Parse("Invoice", field="title")) \
        .select("doc_id")
    inner = files.join(fm, files["id"] == fm["doc_id"], "left_semi")
    assert _correlated_counts(fx, FACTURES, inner) == [
        ("doc1", "Invoice 2023", 2), ("doc2", "Receipt 2023", 0)]


def test_3_non_indexed_inner_filter(fx):
    _, files, _, _ = fx
    inner = files.filter(F.col("file_size") > 500)
    assert _correlated_counts(fx, FACTURES, inner) == [
        ("doc1", "Invoice 2023", 2), ("doc2", "Receipt 2023", 0)]


def test_4_empty_inner_result(fx):
    _, files, _, f_idx = fx
    fm = compile_query(f_idx, ast.Parse("NonExistent", field="title")) \
        .select("doc_id")
    inner = files.join(fm, files["id"] == fm["doc_id"], "left_semi")
    assert _correlated_counts(fx, FACTURES, inner) == [
        ("doc1", "Invoice 2023", 0), ("doc2", "Receipt 2023", 0)]


def test_5_unfiltered_inner_over_or_outer(fx):
    _, files, _, _ = fx
    q = ast.Boolean(should=[ast.Parse("Contracts", field="parents"),
                            ast.Parse("Factures", field="parents")])
    assert _correlated_counts(fx, q, files) == [
        ("doc1", "Invoice 2023", 2), ("doc2", "Receipt 2023", 1),
        ("doc3", "Contract 2023", 1)]
