"""Six small issue-repro pg_regress goldens (PUBLIC reference
behavior, corpora replicated inline):

- ``issue_2528.out`` — scored search AND a heap boolean filter
  (in_stock = true) keeps exact BM25 scores: ids 3, 5 at
  2.4849067 / 2.8772602 over mock_items.
- ``issue_2904.out`` — a bm25 index over a RANGE-PARTITIONED table
  still finds rows: here the analog is an index built with the
  partition_by option (hive-partitioned segments) — search returns
  (1, 'hello').
- ``issue_3212.out`` — TEXT key_field: snippet over an indexed field
  works; snippet over a NON-indexed column raises the reference's
  ``cannot generate snippet for field ... because it was not found in
  the index``.
- ``issue_3301.out`` — count(*) under pdb.all() = 41, pdb.empty() = 0
  on mock_items.
- ``issue_3256.out`` — snippet with max_num_chars => 10, a default
  snippet, and snippet_positions in ONE projection over 'shoes'.
- ``issue_2753.out`` — a non-search expression predicate
  (lower(a) = lower(b)) over an indexed table ORDER BY id LIMIT 5
  returns only the case-insensitive-equal row.

Ref: pg_search/tests/pg_regress/expected/issue_{2528,2904,3212,3301,
3256,2753}.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.highlight import (with_snippet, with_snippet_positions)
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def mock_idx(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category")]))
    return docs, idx


# --- issue_2528.out ----------------------------------------------------------

def test_scored_search_with_heap_bool_filter(mock_idx):
    docs, idx = mock_idx
    m = compile_query(idx, ast.Parse("shoes", field="description"))
    got = (docs.join(m, docs["id"] == m["doc_id"])
           .filter(F.col("in_stock") == True)  # noqa: E712
           .select("id", "score").orderBy("id").limit(5).collect())
    assert [(r["id"], np.float32(r["score"])) for r in got] == \
        [(3, np.float32(2.4849067)), (5, np.float32(2.8772602))]


# --- issue_2904.out ----------------------------------------------------------

def test_search_over_partitioned_index(spark, tmp_path):
    docs = spark.createDataFrame([(1, "hello", 1)],
                                 "id long, description string, pk int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")],
        partition_by="pk"))
    m = compile_query(idx, ast.Parse("hello", field="description"))
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .select("id", "description").collect())
    assert [tuple(r) for r in got] == [(1, "hello")]


# --- issue_3212.out ----------------------------------------------------------

def test_text_key_field_snippet_and_nonindexed_error(spark):
    docs = spark.createDataFrame([(1, "hello", "world")],
                                 "id long, indexed string, "
                                 "nonindexed string")
    idx = build_index(docs, IndexSchema(
        key_field="indexed",
        text_fields=[FieldConfig(name="indexed", tokenizer="keyword")]))
    q = ast.Parse("hello", field="indexed")
    hits = compile_query(idx, q)
    hits = hits.join(docs, hits["doc_id"] == docs["indexed"])
    snip = with_snippet(idx, hits, q, "indexed")
    assert [r["snippet"] for r in snip.collect()] == ["<b>hello</b>"]
    with pytest.raises(KeyError,
                       match=r"cannot generate snippet for field "
                             r"nonindexed because it was not found in "
                             r"the index"):
        with_snippet(idx, hits, q, "nonindexed")


# --- issue_3301.out ----------------------------------------------------------

def test_all_and_empty_counts(mock_idx):
    _, idx = mock_idx
    assert compile_query(idx, ast.All()).count() == 41
    assert compile_query(idx, ast.Empty()).count() == 0


# --- issue_3256.out ----------------------------------------------------------

def test_snippet_tags_maxchars_positions_one_projection(mock_idx):
    docs, idx = mock_idx
    q = ast.Parse("shoes", field="description")
    m = compile_query(idx, q)
    hits = docs.join(m, docs["id"] == m["doc_id"])
    out = with_snippet(idx, hits, q, "description",
                       start_tag="<b>", end_tag="</b>", max_chars=10,
                       out_col="s_short")
    out = with_snippet(idx, out, q, "description",
                       start_tag="<i>", end_tag="</i>", out_col="s_full")
    out = with_snippet_positions(idx, out, q, "description")
    got = sorted((r["s_short"], r["s_full"],
                  [list(p) for p in r["snippet_positions"]])
                 for r in out.collect())
    assert got == sorted([
        ("<b>shoes</b>", "Sleek running <i>shoes</i>", [[14, 19]]),
        ("<b>shoes</b>", "White jogging <i>shoes</i>", [[14, 19]]),
        ("<b>shoes</b>", "Generic <i>shoes</i>", [[8, 13]])])


# --- issue_2753.out ----------------------------------------------------------

def test_expression_equality_non_search_predicate(spark):
    docs = spark.createDataFrame(
        [(1, "google.com", "Google.com"), (2, "fb.com", "facebook.com")],
        "id long, domain_short string, domain_long string")
    build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="domain_short"),
                     FieldConfig(name="domain_long")]))
    got = (docs.filter(F.lower("domain_short") == F.lower("domain_long"))
           .orderBy("id").limit(5).collect())
    assert [tuple(r) for r in got] == [(1, "google.com", "Google.com")]
