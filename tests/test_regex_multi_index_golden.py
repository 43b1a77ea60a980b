"""Ports of three small pg_regress goldens:

- ``regex.out`` — pdb.regex_pattern tokenizer output, pdb.regex term
  query rows over mock_items, and regex under a const-score wrapper.
- ``multi_bm25_index.out`` — two bm25 indexes coexisting over one
  relation mid-swap (CREATE INDEX CONCURRENTLY workflow): queries
  resolve against the newest (highest-OID) index, so fields only the
  new index carries keep working.
- ``missing_terms_with_operator_fn.out`` — ``id = ANY(ARRAY[3]) AND id
  @@@ all()`` both as the TermSet fast-field pushdown and as the
  heap-filter fallback form return the identical row.
"""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.analysis import py_tokenize
from sparksearch.api import rel_get_bm25_index
from sparksearch.fixtures import mock_items_pdf, mock_items_index_schema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _ids(idx, q):
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


# --- regex.out ---------------------------------------------------------------

def test_regex_pattern_tokenizer():
    """'ooh lala'::pdb.regex_pattern('oo|a') → {oo,a,a}."""
    assert py_tokenize("ooh lala", "regex", {"pattern": "oo|a"}) == \
        ["oo", "a", "a"]


def test_regex_term_rows(mock_index):
    """pdb.regex('sh.es') over mock_items description → ids 3, 4, 5
    (Sleek running shoes / White jogging shoes / Generic shoes)."""
    assert _ids(mock_index, ast.Regex("description", "sh.es")) == [3, 4, 5]


def test_regex_const_score(mock_index):
    """pdb.regex('sh.es')::pdb.const(42) → same rows, every score 42."""
    q = ast.ConstScore(ast.Regex("description", "sh.es"), 42.0)
    rows = compile_query(mock_index, q).collect()
    assert sorted(r["doc_id"] for r in rows) == [3, 4, 5]
    assert all(r["score"] == 42.0 for r in rows)


# --- multi_bm25_index.out ----------------------------------------------------

def test_multi_bm25_newest_index_wins(spark):
    rows = [(1, "alpha", '{"invoice_number": "abc-001"}'),
            (2, "beta", '{"invoice_number": "def-002"}')]
    docs = spark.createDataFrame(
        rows, "id long, description string, custom_identifiers string")
    # older index lacks custom_identifiers (previous schema)
    old = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    # newer index adds the json field with literal_normalized values
    new = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description"),
            FieldConfig(name="custom_identifiers", tokenizer="json",
                        tokenizer_opts={"value_tokenizer": "raw"},
                        lowercase=True)]))
    assert new.oid > old.oid
    picked = rel_get_bm25_index([old, new])
    assert picked is new
    # the golden's query: a field only the NEW index knows about resolves
    q = ast.Match("custom_identifiers.invoice_number", "abc-001")
    assert _ids(picked, q) == [1]
    # after dropping the old index the same query still works
    assert _ids(rel_get_bm25_index([new]), q) == [1]
    # ...and the old index alone would NOT know the field (the pre-fix
    # error path the golden describes)
    with pytest.raises(Exception):
        compile_query(old, q).collect()


# --- missing_terms_with_operator_fn.out --------------------------------------

def test_terms_with_operator_and_fallback(spark):
    docs = spark.range(1, 1001).selectExpr("cast(id as int) as id",
                                           "'x' as val")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="val")]))
    # normal path: id = ANY(ARRAY[3]) compiles to a TermSet over the
    # numeric fast field, ANDed with all()
    q = ast.Boolean(must=[ast.TermSet("id", [3]), ast.All()])
    assert _ids(idx, q) == [3]
    # fallback path (terms_with_operator fn dropped): the same predicate
    # as a heap_filter over the full index scan — identical row
    q2 = ast.HeapFilter(ast.All(), "id IN (3)")
    assert _ids(idx, q2) == [3]
