"""tokenizer-indexed-expressions-require-tokenizer.out golden (PUBLIC
reference behavior): a keyword-tokenized expression field
(`lower(t)::pdb.literal`, lowercase normalizer at index time) — query
needles analyze through the KEYWORD tokenizer without the index-time
normalizer, so a raw-cased needle misses ('&&& 'This is a TEST'' → 0
rows) while the pre-lowered needle hits via every operator
(&&&, |||, ###, ===); @@@ (parse) word-splits the query string first
and can never reconstruct the single keyword term.

The reference's companion DDL error ("indexed expression requires a
tokenizer cast with an alias") is unrepresentable here by
construction: FieldConfig always carries a tokenizer.

Ref: pg_search/tests/pg_regress/expected/
     tokenizer-indexed-expressions-require-tokenizer.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def expr_idx(spark):
    docs = spark.createDataFrame(
        [(1, "This is a TEST"), (2, "This is also a TEST")],
        "id long, t string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="t", source="lower(t)",
                                 tokenizer="literal", lowercase=False)]))
    return idx


def _ids(idx, q):
    return sorted(r["doc_id"] for r in
                  compile_query(idx, q).select("doc_id").collect())


def test_raw_cased_needle_misses(expr_idx):
    assert _ids(expr_idx, ast.Match("t", "This is a TEST",
                                    conjunction_mode=True)) == []
    assert _ids(expr_idx, ast.Term("t", "This is a TEST")) == []


def test_parse_word_splits_and_misses(expr_idx):
    assert _ids(expr_idx, ast.Parse("this is a test", field="t",
                                    lenient=True)) == []


def test_lowered_needle_hits_every_operator(expr_idx):
    needle = "this is a test"
    assert _ids(expr_idx, ast.Match("t", needle,
                                    conjunction_mode=True)) == [1]
    assert _ids(expr_idx, ast.Match("t", needle)) == [1]
    assert _ids(expr_idx, ast.TokenizedPhrase("t", needle)) == [1]
    assert _ids(expr_idx, ast.Term("t", needle)) == [1]
