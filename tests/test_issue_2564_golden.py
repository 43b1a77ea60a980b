"""issue_2564.out + issue-3750-repro.out goldens (PUBLIC reference
behavior).

- issue_2564 (NormalScanExecState relational shapes): a three-table
  search-filtered join (parents @@@ 'Factures' AND title @@@ 'Receipt'
  AND content @@@ 'Socienty') returns exactly doc2/file3/page1-row; a
  correlated TopK subselect (best-scoring 'Invoice' file title per
  matching document, LIMIT 1) returns 'Invoice PDF' for doc1 and NULL
  for doc2.
- issue-3750-repro: parallel-visibility parity — ``name &&& 'assist
  wireless'`` over 100k rows counts 70000, adding the non-BM25 filter
  country_code = 'us' counts 40000 (no rows lost to the plan switch).

Ref: pg_search/tests/pg_regress/expected/{issue_2564,
issue-3750-repro}.out
"""

import pytest
from pyspark.sql import Window as W, functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

DOCS = [("doc1", "Invoice 2023", "This is an invoice for services "
         "rendered in 2023", "Factures"),
        ("doc2", "Receipt 2023", "This is a receipt for payment "
         "received in 2023", "Factures"),
        ("doc3", "Contract 2023", "This is a contract for services in "
         "2023", "Contracts"),
        ("doc_cte1", "CTE Test Doc 1", "This document tests common "
         "table expressions", "Reports"),
        ("doc_cte2", "CTE Test Doc 2", "Another document for CTE "
         "testing", "Reports")]
FILES = [("file1", "doc1", "Invoice PDF", "/invoices/2023.pdf", 1024),
         ("file2", "doc1", "Invoice Receipt",
          "/invoices/2023_receipt.pdf", 512),
         ("file3", "doc2", "Receipt", "/receipts/2023.pdf", 256),
         ("file4", "doc3", "Contract Document", "/contracts/2023.pdf",
          2048),
         ("file_cte1", "doc_cte1", "CTE Test File 1",
          "/reports/cte1.pdf", 500),
         ("file_cte2", "doc_cte1", "CTE Test File 2",
          "/reports/cte2.pdf", 600),
         ("file_cte3", "doc_cte2", "CTE Test File 3",
          "/reports/cte3.pdf", 700)]
PAGES = [("page1", "file1", 1, "Page 1 of Invoice PDF with Socienty "
          "General details"),
         ("page2", "file1", 2, "Page 2 of Invoice PDF with payment "
          "information"),
         ("page3", "file2", 1, "Page 1 of Invoice Receipt with bank "
          "details"),
         ("page4", "file3", 1, "Page 1 of Receipt with Socienty "
          "General information"),
         ("page5", "file3", 2, "Page 2 of Receipt with transaction ID"),
         ("page6", "file4", 1, "Page 1 of Contract Document with terms "
          "and conditions"),
         ("page_cte1", "file_cte1", 1, "Page 1 with searchable content "
          "for CTE testing"),
         ("page_cte2", "file_cte1", 2, "Page 2 with more content for "
          "testing"),
         ("page_cte3", "file_cte2", 1, "Another page with test terms "
          "to search"),
         ("page_cte4", "file_cte3", 1, "Final test page for CTE "
          "testing")]


@pytest.fixture(scope="module")
def rel(spark):
    d = spark.createDataFrame(DOCS, "id string, title string, "
                                    "content string, parents string")
    f = spark.createDataFrame(FILES, "id string, documentId string, "
                                     "title string, file_path string, "
                                     "file_size int")
    p = spark.createDataFrame(PAGES, "id string, fileId string, "
                                     "page_number int, content string")
    d_idx = build_index(d, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="parents"),
                                     FieldConfig(name="content")]))
    f_idx = build_index(f, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="file_path")]))
    p_idx = build_index(p, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    return d, f, p, d_idx, f_idx, p_idx


def _semi(df, idx, q):
    m = compile_query(idx, q).select("doc_id")
    return df.join(m, df["id"] == m["doc_id"], "left_semi")


def test_three_table_search_join(rel):
    d, f, p, d_idx, f_idx, p_idx = rel
    dd = _semi(d, d_idx, ast.Parse("Factures", field="parents"))
    ff = _semi(f, f_idx, ast.Parse("Receipt", field="title"))
    pp = _semi(p, p_idx, ast.Parse("Socienty", field="content"))
    got = (dd.join(ff.select(F.col("id").alias("fid"), "documentId",
                             F.col("title").alias("ftitle"), "file_path"),
                   dd["id"] == F.col("documentId"))
           .join(pp.select("fileId", "page_number"),
                 F.col("fid") == F.col("fileId"))
           .select("id", "parents", "ftitle", "file_path", "fileId",
                   "page_number")
           .orderBy("id", "fid", "fileId").collect())
    assert [tuple(r) for r in got] == \
        [("doc2", "Factures", "Receipt", "/receipts/2023.pdf", "file3",
          1)]


def test_correlated_topk_subselect(rel):
    d, f, p, d_idx, f_idx, p_idx = rel
    dd = _semi(d, d_idx, ast.Parse("Factures", field="parents"))
    # best-scoring 'Invoice' file per document, LIMIT 1 — the
    # parameterized TopK subplan as a ranking window over one scan
    fm = compile_query(f_idx, ast.Parse("Invoice", field="title"))
    ranked = (f.join(fm, f["id"] == fm["doc_id"])
              .withColumn("rn", F.row_number().over(
                  W.partitionBy("documentId")
                  .orderBy(F.col("score").desc(), F.col("id"))))
              .filter(F.col("rn") == 1)
              .select("documentId", F.col("title").alias("file_title")))
    got = (dd.join(ranked, dd["id"] == ranked["documentId"], "left")
           .select("id", "title", "parents", "file_title")
           .orderBy("id").collect())
    assert [tuple(r) for r in got] == \
        [("doc1", "Invoice 2023", "Factures", "Invoice PDF"),
         ("doc2", "Receipt 2023", "Factures", None)]


# --- issue-3750-repro ----------------------------------------------------------

def test_parallel_visibility_parity(spark):
    i = F.col("id")
    names = ["assist wireless", "wireless assist",
             "assist wireless service", "assist wireless shop",
             "assist wireless center", "assist wireless store",
             "assist wireless outlet", "other business",
             "random service", "unrelated shop"]
    docs = spark.range(1, 100_001).select(
        i.cast("string").alias("id"),
        F.element_at(F.array(*[F.lit(n) for n in names]),
                     (i % 10 + 1).cast("int")).alias("name"),
        F.when(i % 2 == 0, "us").otherwise("ca").alias("country_code"))
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="country_code")]))
    conj = ast.Match("name", "assist wireless", conjunction_mode=True)
    assert compile_query(idx, conj).count() == 70_000
    q = ast.HeapFilter(conj, "country_code = 'us'")
    assert compile_query(idx, q).count() == 40_000
    # the issue's workaround form (AND id @@@ all()) is a no-op here
    q2 = ast.Boolean(must=[conj, ast.All()])
    assert compile_query(idx, ast.HeapFilter(
        q2, "country_code = 'us'")).count() == 40_000
