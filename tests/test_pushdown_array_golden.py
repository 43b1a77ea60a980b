"""pushdown_array_field.out parity — TEXT[] fields under pdb.literal.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
pushdown_array_field.out.  A TEXT[] column indexed with the literal
tokenizer makes EACH ARRAY ELEMENT its own raw term: the golden pushes
``'dog' = ANY(description)`` down to ``{"term": {"value": "dog"}}`` and
returns exactly the row whose array contains 'dog'.  With the default
word tokenizer the predicate is NOT pushed down (heap filter over the
array) but the row set is identical.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def arrays(spark):
    df = spark.createDataFrame(
        [(1, ["dog", "cat", "bird"]), (2, ["fox", "rabbit", "squirrel"])],
        "id int, description array<string>")
    lit_idx = build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="literal")]))
    word_idx = build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    return df, lit_idx, word_idx


def _ids(idx, q):
    return {r["doc_id"] for r in
            compile_query(idx, q).select("doc_id").collect()}


def test_literal_array_element_terms(arrays):
    _, lit_idx, _ = arrays
    # pushdown_array_field.out: 'dog' = ANY(description) ≡ term "dog"
    assert _ids(lit_idx, ast.Term("description", "dog")) == {1}
    assert _ids(lit_idx, ast.Term("description", "fox")) == {2}
    # the whole-array join string is NOT a term — elements are terms
    assert _ids(lit_idx, ast.Term("description", "dog cat bird")) == set()
    # literal is raw: case-mismatched needle misses
    assert _ids(lit_idx, ast.Term("description", "Dog")) == set()


def test_word_tokenizer_same_rowset(arrays):
    # non-literal tokenizer: no term pushdown in the reference (heap
    # filter), but the visible row set is the same
    _, _, word_idx = arrays
    assert _ids(word_idx, ast.Term("description", "dog")) == {1}
    assert _ids(word_idx, ast.Term("description", "fox")) == {2}


def test_literal_array_termset(arrays):
    _, lit_idx, _ = arrays
    q = ast.TermSet("description", ["dog", "squirrel"])
    assert _ids(lit_idx, q) == {1, 2}


def test_plain_string_keyword_unchanged(spark):
    # a scalar text column under keyword stays ONE whole-value term
    df = spark.createDataFrame([(1, "dog cat bird")], "id int, val string")
    idx = build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="val", tokenizer="keyword")]))
    assert _ids(idx, ast.Term("val", "dog cat bird")) == {1}
    assert _ids(idx, ast.Term("val", "dog")) == set()
