"""issue_3678.out golden (PUBLIC reference behavior, 10× scaled-down
corpus): grouped MAX(score) over an ngram(3,6) conjunction match plus
a uuid term and two IS-NULL predicates on a partial index (``WHERE
deleted_at IS NULL``) — ``GROUP BY profile_id ORDER BY best_score
DESC, profile_id LIMIT 5``.  The reference bug was a planner path
choice (forced parallel custom scan); the semantics it protects are
(a) the query executes with scores through the heap-filter + term
conjunction and (b) every qualifying profile's best score ties (all
matching docs have identical company ngram stats), so the page is the
first five profile_ids in order.  Corpus shape is the golden's
generate_series construction at gs=1..30000 (structure identical,
absolute scores scale with corpus statistics, so the assertion pins
ids + exact tie structure rather than the 300k-row float).

Ref: pg_search/tests/pg_regress/expected/issue_3678.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

N = 30_000
G1 = "952582b4-bb51-461e-b566-0e5f980f4660"
G2 = "b0000000-0000-0000-0000-000000000001"


@pytest.fixture(scope="module")
def nhfs(spark):
    gs = F.col("id")
    docs = (spark.range(1, N + 1).select(
        gs.alias("id"),
        F.when(gs % 10 == 0, "Software Developer").otherwise("Other Role")
        .alias("title"),
        F.when(gs % 20 == 0, "Jarvis Corp")
        .when(gs % 20 == 1, "Jarvik Medical")
        .when(gs % 20 == 2, "Jarvinen Tech")
        .when(gs % 20 == 3, "Jarvi Solutions")
        .otherwise(F.concat(F.lit("Acme Corp "), gs.cast("string")))
        .alias("company_name"),
        F.format_string("a0000000-0000-0000-0000-%012d", (gs % 5000) + 1)
        .alias("profile_id"),
        F.when(gs % 5 < 4, G1).otherwise(G2).alias("group_id"),
        F.when(gs % 3 == 0, F.lit(None).cast("date"))
        .otherwise(F.lit("2025-12-31").cast("date")).alias("end_date"),
        F.lit(None).cast("timestamp").alias("deleted_at")))
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="title", tokenizer="simple",
                        filters=[("stemmer", "english"), "ascii_folding"]),
            FieldConfig(name="company_name", tokenizer="ngram",
                        tokenizer_opts={"min_gram": 3, "max_gram": 6}),
            FieldConfig(name="profile_id", field_type="uuid"),
            FieldConfig(name="group_id", field_type="uuid")],
        predicate="deleted_at IS NULL"))
    return idx, docs


def _page(idx, docs, match_field, needle, extra_pred):
    q = ast.HeapFilter(
        ast.Boolean(must=[
            ast.Match(match_field, needle, conjunction_mode=True),
            ast.Term("group_id", G1)]),
        extra_pred)
    m = compile_query(idx, q)
    joined = m.join(docs.select(F.col("id").alias("doc_id"), "profile_id"),
                    "doc_id")
    page = (joined.groupBy("profile_id")
            .agg(F.max("score").alias("best_score"))
            .orderBy(F.col("best_score").desc(), "profile_id")
            .limit(5).collect())
    return [(r["profile_id"], r["best_score"]) for r in page]


def test_ngram_with_heap_filter(nhfs):
    """Test 2: the ngram+heap-filter shape that panicked pre-fix."""
    idx, docs = nhfs
    got = _page(idx, docs, "company_name", "Jarvi",
                "deleted_at IS NULL AND end_date IS NULL")
    want_ids = [f"a0000000-0000-0000-0000-{i:012d}"
                for i in (1, 21, 41, 61, 81)]
    assert [p for p, _ in got] == want_ids
    # every best score ties (identical company ngram statistics)
    assert len({s for _, s in got}) == 1


def test_simple_tokenizer_control(nhfs):
    """Test 3: pdb.simple + same heap filter (the always-working
    control)."""
    idx, docs = nhfs
    got = _page(idx, docs, "title", "developer",
                "deleted_at IS NULL AND end_date IS NULL")
    want_ids = [f"a0000000-0000-0000-0000-{i:012d}"
                for i in (1, 11, 21, 31, 41)]
    assert [p for p, _ in got] == want_ids
    assert len({s for _, s in got}) == 1


def test_ngram_without_heap_filter(nhfs):
    """Test 4: ngram without the end_date IS NULL heap filter."""
    idx, docs = nhfs
    got = _page(idx, docs, "company_name", "Jarvi",
                "deleted_at IS NULL")
    want_ids = [f"a0000000-0000-0000-0000-{i:012d}"
                for i in (1, 21, 41, 61, 81)]
    assert [p for p, _ in got] == want_ids
