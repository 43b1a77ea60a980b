"""columnar_queries_01..05 goldens (PUBLIC reference behavior, tables
replicated inline): relational query shapes over fast-field scans —
3-table complex join with per-table search predicates, ORDER BY over
fast fields, chained CTEs each with their own search predicate,
correlated-subquery counts ordered by the count, and a 10k-row keyword
equijoin with both `=` and `@@@` predicate forms.

Ref: pg_search/tests/pg_regress/expected/columnar_queries_01_complex_join.out
     .._02_order_by.out .._03_cte_test.out .._04_subquery.out .._05_join2.out
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
    ("doc_cte1", "CTE Test Doc 1",
     "This document tests common table expressions", "Reports"),
    ("doc_cte2", "CTE Test Doc 2",
     "Another document for CTE testing", "Reports"),
]
FILES = [
    ("file1", "doc1", "Invoice PDF", "/invoices/2023.pdf", 1024),
    ("file2", "doc1", "Invoice Receipt", "/invoices/2023_receipt.pdf",
     512),
    ("file3", "doc2", "Receipt", "/receipts/2023.pdf", 256),
    ("file4", "doc3", "Contract Document", "/contracts/2023.pdf", 2048),
    ("file_cte1", "doc_cte1", "CTE Test File 1", "/reports/cte1.pdf",
     500),
    ("file_cte2", "doc_cte1", "CTE Test File 2", "/reports/cte2.pdf",
     600),
    ("file_cte3", "doc_cte2", "CTE Test File 3", "/reports/cte3.pdf",
     700),
]
PAGES = [
    ("page1", "file1", 1, "Page 1 of Invoice PDF with Socienty General "
     "details"),
    ("page2", "file1", 2, "Page 2 of Invoice PDF with payment "
     "information"),
    ("page3", "file2", 1, "Page 1 of Invoice Receipt with bank details"),
    ("page4", "file3", 1, "Page 1 of Receipt with Socienty General "
     "information"),
    ("page5", "file3", 2, "Page 2 of Receipt with transaction ID"),
    ("page6", "file4", 1, "Page 1 of Contract Document with terms and "
     "conditions"),
    ("page_cte1", "file_cte1", 1, "Page 1 with searchable content for "
     "CTE testing"),
    ("page_cte2", "file_cte1", 2, "Page 2 with more content for testing"),
    ("page_cte3", "file_cte2", 1, "Another page with test terms to "
     "search"),
    ("page_cte4", "file_cte3", 1, "Final test page for CTE testing"),
]


@pytest.fixture(scope="module")
def fx(spark):
    documents = spark.createDataFrame(
        DOCS, "id string, title string, content string, parents string")
    files = spark.createDataFrame(
        FILES, "id string, documentId string, title string, "
        "file_path string, file_size int")
    pages = spark.createDataFrame(
        PAGES, "id string, fileId string, page_number int, "
        "content string")
    d_idx = build_index(documents, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="parents"),
                                     FieldConfig(name="content")]))
    f_idx = build_index(files, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="documentId", tokenizer="keyword"),
                     FieldConfig(name="title"),
                     FieldConfig(name="file_path")]))
    p_idx = build_index(pages, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="fileId", tokenizer="keyword"),
                     FieldConfig(name="content")]))
    return documents, files, pages, d_idx, f_idx, p_idx


def _sub(df, idx, q, key="id"):
    m = compile_query(idx, q).select("doc_id")
    return df.join(m, df[key] == m["doc_id"], "left_semi")


def test_01_three_table_complex_join(fx):
    documents, files, pages, d_idx, f_idx, p_idx = fx
    d = _sub(documents, d_idx,
             ast.Parse("Factures", field="parents")).alias("d")
    f = _sub(files, f_idx, ast.Parse("Receipt", field="title")).alias("f")
    p = _sub(pages, p_idx,
             ast.Parse("Socienty", field="content")).alias("p")
    got = (d.join(f, F.col("d.id") == F.col("f.documentId"))
           .join(p, F.col("p.fileId") == F.col("f.id"))
           .select("d.id", "d.parents", "f.title", "f.file_path",
                   "p.fileId", "p.page_number")
           .orderBy("d.id", "f.id", "p.id").collect())
    assert [tuple(r) for r in got] == [
        ("doc2", "Factures", "Receipt", "/receipts/2023.pdf",
         "file3", 1)]


def test_01b_projection_with_limit(fx):
    documents, files, pages, d_idx, f_idx, p_idx = fx
    d = _sub(documents, d_idx,
             ast.Parse("Factures", field="parents")).alias("d")
    f = _sub(files, f_idx, ast.Parse("Receipt", field="title")).alias("f")
    p = _sub(pages, p_idx,
             ast.Parse("Socienty", field="content")).alias("p")
    got = (d.join(f, F.col("d.id") == F.col("f.documentId"))
           .join(p, F.col("p.fileId") == F.col("f.id"))
           .select("p.fileId", "p.page_number", "p.content")
           .orderBy("p.fileId", "p.page_number").limit(10).collect())
    assert [(r["fileId"], r["page_number"]) for r in got] == [("file3", 1)]
    assert "Socienty General" in got[0]["content"]


def test_02_order_by_fast_fields(fx):
    _, _, pages, _, _, p_idx = fx
    got = (_sub(pages, p_idx, ast.Parse("Socienty", field="content"))
           .select("fileId", "page_number")
           .orderBy("fileId", "page_number").collect())
    assert [tuple(r) for r in got] == [("file1", 1), ("file3", 1)]


def test_03_chained_ctes(fx):
    documents, files, pages, d_idx, f_idx, p_idx = fx
    searchable_docs = _sub(
        documents, d_idx,
        ast.Boolean(must=[ast.Parse("CTE Test", field="title"),
                          ast.Parse("Reports", field="parents")])) \
        .select("id", "title", "parents").alias("sd")
    matching_files = (_sub(files, f_idx,
                           ast.Parse("CTE Test", field="title"))
                      .alias("f")
                      .join(searchable_docs,
                            F.col("f.documentId") == F.col("sd.id"),
                            "left_semi")
                      .select("id", "documentId", "title", "file_size")
                      .alias("mf"))
    relevant_pages = (_sub(pages, p_idx,
                           ast.Parse("searchable OR testing",
                                     field="content")).alias("p")
                      .join(matching_files,
                            F.col("p.fileId") == F.col("mf.id"),
                            "left_semi")
                      .select("id", "fileId", "page_number").alias("rp"))
    got = (searchable_docs
           .join(matching_files,
                 F.col("sd.id") == F.col("mf.documentId"))
           .join(relevant_pages, F.col("mf.id") == F.col("rp.fileId"))
           .select(F.col("sd.title").alias("document_title"),
                   F.col("mf.title").alias("file_title"),
                   "mf.file_size", "rp.page_number")
           .orderBy("document_title", "file_title", "page_number")
           .collect())
    assert [tuple(r) for r in got] == [
        ("CTE Test Doc 1", "CTE Test File 1", 500, 1),
        ("CTE Test Doc 1", "CTE Test File 1", 500, 2),
        ("CTE Test Doc 2", "CTE Test File 3", 700, 1)]


def test_04_correlated_count_ordered_by_count(fx):
    documents, files, _, d_idx, f_idx, _ = fx
    fm = _sub(files, f_idx, ast.Parse("Invoice", field="title"))
    counts = (fm.groupBy("documentId").agg(F.count("*").alias("n"))
              .withColumnRenamed("documentId", "did"))
    d = _sub(documents, d_idx, ast.Parse("Factures", field="parents"))
    got = (d.join(counts, d["id"] == F.col("did"), "left")
           .select("id", "title", "parents",
                   F.coalesce("n", F.lit(0)).alias("invoice_file_count"))
           .orderBy(F.col("invoice_file_count").desc(), F.col("id"))
           .collect())
    assert [tuple(r) for r in got] == [
        ("doc1", "Invoice 2023", "Factures", 2),
        ("doc2", "Receipt 2023", "Factures", 0)]


NAMES = ["alice", "bob", "cloe", "sally", "brandy", "brisket", "anchovy"]
COLORS = ["red", "green", "blue", "orange", "purple", "pink", "yellow"]


def test_05_keyword_equijoin_10k(spark):
    """10k-row deterministic corpus: `=` and `@@@` forms agree; only the
    seeded row pairs (bob, blue)."""
    rows = [(1, "bob", "blue", "20")]
    rows += [(i + 1, NAMES[i % 7], COLORS[i % 7],
              str(20 + i % 80)) for i in range(1, 10001)]
    users = spark.createDataFrame(
        rows, "id long, name string, color string, age string")
    orders = spark.createDataFrame(
        rows, "id long, name string, color string, age string")
    idx = build_index(users, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword"),
                     FieldConfig(name="color", tokenizer="keyword"),
                     FieldConfig(name="age", tokenizer="keyword")]))
    # plain equality
    eq = (users.alias("u")
          .join(orders.alias("o"), F.col("u.id") == F.col("o.id"))
          .filter((F.col("u.color") == "blue") & (F.col("u.name") == "bob"))
          .select("u.color").limit(10).collect())
    assert [r["color"] for r in eq] == ["blue"]
    # @@@ form through the index
    m = compile_query(idx, ast.Boolean(must=[
        ast.Term("color", "blue"), ast.Term("name", "bob")])) \
        .select("doc_id")
    uu = users.join(m, users["id"] == m["doc_id"], "left_semi").alias("u")
    got = (uu.join(orders.alias("o"), F.col("u.id") == F.col("o.id"))
           .select("u.color").limit(10).collect())
    assert [r["color"] for r in got] == ["blue"]
