"""issue_4149.out golden (PUBLIC reference behavior): TopK over a
must + nested-should boolean of three parse_with_field arms.

125 synthetic document rows (the golden's ceil(1000/8)); rows with
i % 10 ∈ {0, 1} carry special titles/parents that do NOT match.  The
query

    doc_parents @@@ 'PARENT_GROUP'
    AND (file_title @@@ 'Title' OR doc_title @@@ 'Title')
    ORDER BY score DESC LIMIT 10

matches the 100 ordinary rows, all tied at float32 score 0.6682782
(sum of the three arms' BM25: two PARENT/GROUP terms + the two Title
arms), and the deterministic (score desc, key asc) page is file_id
2..9, 12, 13 — exactly the golden's rows.

Ref: pg_search/tests/pg_regress/expected/issue_4149.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.search import search

GOLD_SCORE = np.float32(0.6682782)
GOLD_IDS = [2, 3, 4, 5, 6, 7, 8, 9, 12, 13]


@pytest.fixture(scope="module")
def docs_index(spark):
    i = F.col("id")
    df = spark.range(1, 126).select(
        i.cast("int").alias("row_id"),
        i.cast("int").alias("file_id"),
        F.when(i % 10 == 0, F.concat(F.lit("collab12 "), i))
         .when(i % 10 == 1, F.concat(F.lit("FY2025_BUDGET_DATA "), i))
         .otherwise(F.concat(F.lit("File Title "), i)).alias("file_title"),
        F.concat(F.lit("Document Title "), i).alias("doc_title"),
        F.when(i % 10 == 0, F.concat(F.lit("SFR "), i))
         .when(i % 10 == 1, F.concat(F.lit("PROJECT_ALPHA "), i))
         .otherwise(F.concat(F.lit("PARENT_GROUP_"), i % 200, F.lit(" "), i))
         .alias("doc_parents"))
    # the golden's index: tokenizer {"type": "default"} on all three
    # text fields, fast=true
    schema = IndexSchema(
        key_field="row_id",
        text_fields=[FieldConfig(name="file_title", tokenizer="default",
                                 fast=True),
                     FieldConfig(name="doc_title", tokenizer="default",
                                 fast=True),
                     FieldConfig(name="doc_parents", tokenizer="default",
                                 fast=True)])
    return build_index(df, schema)


def _query():
    return ast.Boolean(must=[
        ast.Parse("PARENT_GROUP", field="doc_parents"),
        ast.Boolean(should=[ast.Parse("Title", field="file_title"),
                            ast.Parse("Title", field="doc_title")])])


def test_top10_rows_and_scores(docs_index):
    rows = search(docs_index, _query(), limit=10,
                  order_by=[("score", "desc"), ("row_id", "asc")],
                  columns=["file_id", "file_title"]).collect()
    assert [r["file_id"] for r in rows] == GOLD_IDS
    assert [r["file_title"] for r in rows] == \
        [f"File Title {i}" for i in GOLD_IDS]
    for r in rows:
        assert np.float32(r["score"]) == GOLD_SCORE


def test_match_set_is_the_100_ordinary_rows(docs_index):
    rows = search(docs_index, _query(), columns=["file_id"]).collect()
    got = sorted(r["file_id"] for r in rows)
    want = sorted(i for i in range(1, 126) if i % 10 not in (0, 1))
    assert got == want
