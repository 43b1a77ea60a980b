"""join_outer.out golden (PUBLIC reference behavior): LEFT / RIGHT /
FULL outer joins through the search scan, on a corpus shaped so both
sides have unmatched rows — files 1..50 have no pages, and pages with
file_id 201..250 dangle.

Pinned: null-extension on each side, ordering that surfaces the
null-extended region, FULL+ON-clause search predicate vs FULL+WHERE
(the WHERE on the preserved side reduces FULL to LEFT), the anti-join
spelled LEFT ... IS NULL, and aggregates over the outer join
(COUNT(*) counts preserved rows, COUNT(f.id) skips null-extensions).

Ref: pg_search/tests/pg_regress/expected/join_outer.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def corpus(spark):
    files = spark.createDataFrame(
        [(g, f"file-{g}", f"Section {g} has content for testing")
         for g in range(1, 201)],
        "id long, title string, content string")
    pages = spark.createDataFrame(
        [(g, 51 + (g % 200), f"Page body {g} of the file")
         for g in range(1, 1001)],
        "id long, file_id long, page_text string")
    f_idx = build_index(files, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="title"),
                                     FieldConfig(name="content")]))
    p_idx = build_index(pages, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="page_text")]))
    return files, pages, f_idx, p_idx


def _pages_matched(corpus):
    files, pages, f_idx, p_idx = corpus
    m = compile_query(p_idx, ast.Term("page_text", "page")).select("doc_id")
    return pages.join(m, pages["id"] == m["doc_id"]).drop("doc_id")


def _files_matched(corpus):
    files, pages, f_idx, p_idx = corpus
    m = compile_query(f_idx, ast.Term("content", "section")).select("doc_id")
    return files.join(m, files["id"] == m["doc_id"]).drop("doc_id")


def test_left_pages_preserved(corpus):
    files, pages, _, _ = corpus
    p = _pages_matched(corpus).alias("p")
    f = files.alias("f")
    got = (p.join(f, F.col("f.id") == F.col("p.file_id"), "left")
           .select("p.id", "p.file_id", "f.title")
           .orderBy("p.id").limit(10).collect())
    assert [(r["id"], r["file_id"], r["title"]) for r in got] == \
        [(g, 51 + g, f"file-{51 + g}") for g in range(1, 11)]


def test_left_null_extended_region_on_top(corpus):
    files, pages, _, _ = corpus
    p = _pages_matched(corpus).alias("p")
    f = files.alias("f")
    got = (p.join(f, F.col("f.id") == F.col("p.file_id"), "left")
           .select("p.id", "p.file_id", "f.title")
           .orderBy(F.col("p.file_id").desc(), F.col("p.id").asc())
           .limit(10).collect())
    assert [(r["id"], r["file_id"], r["title"]) for r in got] == [
        (199, 250, None), (399, 250, None), (599, 250, None),
        (799, 250, None), (999, 250, None),
        (198, 249, None), (398, 249, None), (598, 249, None),
        (798, 249, None), (998, 249, None)]


def test_left_files_preserved(corpus):
    files, pages, _, _ = corpus
    f = _files_matched(corpus).alias("f")
    p = pages.alias("p")
    got = (f.join(p, F.col("f.id") == F.col("p.file_id"), "left")
           .select("f.id", "f.title", F.col("p.id").alias("page_id"))
           .orderBy(F.col("f.id").asc(), F.col("page_id").asc())
           .limit(10).collect())
    # files 1..50 have no pages: null-extended page side
    assert [(r["id"], r["title"], r["page_id"]) for r in got] == \
        [(g, f"file-{g}", None) for g in range(1, 11)]


def test_right_join_equals_left_reversed(corpus):
    files, pages, _, _ = corpus
    p = _pages_matched(corpus).alias("p")
    f = files.alias("f")
    got = (f.join(p, F.col("f.id") == F.col("p.file_id"), "right")
           .select("p.id", "p.file_id", "f.title")
           .orderBy("p.id").limit(10).collect())
    assert [(r["id"], r["file_id"], r["title"]) for r in got] == \
        [(g, 51 + g, f"file-{51 + g}") for g in range(1, 11)]


def test_full_join_search_in_on_clause(corpus):
    # FULL ... ON f.id = p.file_id AND f.content @@@ 'Section': every
    # file matches 'section', files 1..50 still null-extend; ordered
    # f.id NULLS LAST, p.id NULLS LAST the first rows are those files
    files, pages, _, _ = corpus
    f = _files_matched(corpus).alias("f")
    p = pages.alias("p")
    got = (f.join(p, F.col("f.id") == F.col("p.file_id"), "full")
           .select("f.id", F.col("p.id").alias("page_id"), "p.file_id")
           .orderBy(F.col("f.id").asc_nulls_last(),
                    F.col("page_id").asc_nulls_last())
           .limit(10).collect())
    assert [(r["id"], r["page_id"], r["file_id"]) for r in got] == \
        [(g, None, None) for g in range(1, 11)]


def test_full_join_where_on_pages_reduces_to_left(corpus):
    # the WHERE on the pages side can't be satisfied by null-extended
    # page rows, so FULL reduces to LEFT preserving pages
    files, pages, _, p_idx = corpus
    matched = compile_query(p_idx, ast.Term("page_text", "page")) \
        .select(F.col("doc_id").alias("mid"))
    f = files.alias("f")
    p = pages.alias("p")
    got = (f.join(p, F.col("f.id") == F.col("p.file_id"), "full")
           .join(matched, F.col("p.id") == F.col("mid"))  # the WHERE
           .select("f.id", F.col("p.id").alias("page_id"), "p.file_id")
           .orderBy("page_id").limit(10).collect())
    assert [(r["id"], r["page_id"], r["file_id"]) for r in got] == \
        [(51 + g, g, 51 + g) for g in range(1, 11)]


def test_anti_join_via_left_is_null(corpus):
    files, pages, _, _ = corpus
    p = _pages_matched(corpus).alias("p")
    f = files.alias("f")
    got = (p.join(f, F.col("f.id") == F.col("p.file_id"), "left")
           .filter(F.col("f.id").isNull())
           .select("p.id", "p.file_id")
           .orderBy("p.id").limit(10).collect())
    assert [(r["id"], r["file_id"]) for r in got] == \
        [(149 + g, 200 + g) for g in range(1, 11)]


def test_aggregates_over_outer_join(corpus):
    files, pages, _, _ = corpus
    p = _pages_matched(corpus).alias("p")
    f = files.alias("f")
    j = p.join(f, F.col("f.id") == F.col("p.file_id"), "left")
    row = j.agg(F.count("*").alias("all"),
                F.count("f.id").alias("fid")).first()
    # COUNT(*) counts every preserved page row; COUNT(f.id) skips the
    # 250 dangling file_ids x 1000/200 pages each = 250 null-extensions
    assert row["all"] == 1000
    assert row["fid"] == 750


def test_outer_join_plan_broadcasts_search_side(corpus):
    """The distributed plan broadcasts the small (files) side under the
    outer join — the reference's CollectLeft HashJoin analog."""
    files, pages, _, _ = corpus
    p = _pages_matched(corpus).alias("p")
    f = F.broadcast(files.alias("f"))
    j = p.join(f, F.col("f.id") == F.col("p.file_id"), "left")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
