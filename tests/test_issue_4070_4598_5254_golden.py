"""issue_4070.out + issue_4598.out + issue_5254.out goldens (PUBLIC
reference behavior, corpora replicated inline):

- ``issue_4070.out`` — numeric @@@ forms route identically to their
  native counterparts: ``rating @@@ '4'`` ≡ rating = 4,
  ``rating @@@ 'IN [1 2]'`` ≡ rating IN (1, 2), and the
  pdb.all()-AND-attribute forms match the same rows.  (The golden is
  EXPLAIN-only; the pinned behavior here is the four-way row-set
  equivalence its Tantivy Query lines imply.)
- ``issue_4598.out`` — InitPlan array parameters / prepared-statement
  params under parallel workers: COUNT with a 5-element build-side
  IN-list = 5; an equality param that hashes nothing = 0.
- ``issue_5254.out`` — a literal_normalized ALIAS field is queryable
  in a read-only context (no write-back on query): 'alpha' matches
  via the lowercasing alias, 'beta' after alias= re-parse; queries
  never mutate the index (asserted by re-running).

Ref: pg_search/tests/pg_regress/expected/issue_{4070,4598,5254}.out
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _ids(idx, q):
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


# --- issue_4070.out ----------------------------------------------------------

def test_numeric_query_forms_equivalent(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description",
                                 tokenizer="literal")],
        numeric_fields=["rating"]))
    want4 = sorted(r["id"] for r in
                   docs.filter(F.col("rating") == 4).collect())
    assert want4 and _ids(idx, ast.Parse("4", field="rating")) == want4
    assert _ids(idx, ast.Term("rating", 4)) == want4
    want12 = sorted(r["id"] for r in
                    docs.filter(F.col("rating").isin(1, 2)).collect())
    assert want12 and \
        _ids(idx, ast.Parse("IN [1 2]", field="rating")) == want12
    assert _ids(idx, ast.Boolean(
        must=[ast.All(), ast.TermSet("rating", [1, 2])])) == want12
    assert _ids(idx, ast.Boolean(
        must=[ast.All(), ast.Term("rating", 4)])) == want4


# --- issue_4598.out ----------------------------------------------------------

def test_initplan_array_and_external_params(spark):
    rows = [(i, f"test content {i}",
             hashlib.md5(str(i).encode()).hexdigest())
            for i in range(1, 1001)]
    docs = spark.createDataFrame(
        rows, "id int, mock_text string, mock_hash string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="mock_text"),
                     FieldConfig(name="mock_hash",
                                 tokenizer="keyword")]))
    m = compile_query(idx, ast.All())
    hashes = [r["mock_hash"] for r in docs.limit(5).collect()]
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .filter(F.col("mock_hash").isin(hashes)).count())
    assert got == 5
    # PARAM_EXTERN: md5('test') matches no generated row hash
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .filter(F.col("mock_hash") ==
                   "098f6bcd4621d373cade4e832627b4f6").count())
    assert got == 0


# --- issue_5254.out ----------------------------------------------------------

def test_literal_normalized_alias_read_only(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, bar string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="bar", tokenizer="literal"),
            FieldConfig(name="bar_lower", source="bar",
                        tokenizer="literal_normalized")]))
    assert _ids(idx, ast.Parse("alpha", field="bar_lower")) == [1]
    # alias= re-parse must not produce alias=alias=... — the second
    # query through the same alias still resolves
    assert _ids(idx, ast.Parse("beta", field="bar_lower")) == [2]
    # read-only: querying twice returns identical results (no
    # write-back into the persisted index)
    assert _ids(idx, ast.Parse("alpha", field="bar_lower")) == [1]
