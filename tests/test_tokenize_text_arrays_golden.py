"""tokenize-text-arrays.out golden (PUBLIC reference behavior, tables
replicated inline): TEXT[] / VARCHAR[] columns index per-element —
under the default word tokenizer each element word-splits (so
``=== 'blue'`` matches a row whose element is 'blue green', and
``=== 'blue green'`` matches nothing: that two-word term never
exists), while under ``pdb.literal`` each element is ONE raw term
(``=== 'blue'`` no longer matches 'blue green'; ``=== 'blue green'``
matches both rows).  paradedb.schema() shows the matching
tokenizer/normalizer rows.

Ref: pg_search/tests/pg_regress/expected/tokenize-text-arrays.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import schema as pdb_schema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [(1, ["red", "blue", "blue green"]), (2, ["blue green"])]


@pytest.fixture(scope="module")
def arr_docs(spark):
    return spark.createDataFrame(ROWS, "id long, arr array<string>")


@pytest.fixture(scope="module")
def idx_default(arr_docs):
    return build_index(arr_docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="arr")]))


@pytest.fixture(scope="module")
def idx_literal(arr_docs):
    return build_index(arr_docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="arr", tokenizer="keyword",
                                 lowercase=False)]))


def _ids(idx, value):
    return sorted(r[0] for r in
                  compile_query(idx, ast.Term("arr", value))
                  .select("doc_id").collect())


def test_default_tokenizer_word_matrix(idx_default):
    assert _ids(idx_default, "red") == [1]
    assert _ids(idx_default, "blue") == [1, 2]      # 'blue green' splits
    assert _ids(idx_default, "blue green") == []    # term never exists


def test_literal_element_matrix(idx_literal):
    assert _ids(idx_literal, "red") == [1]
    assert _ids(idx_literal, "blue") == [1]         # raw element only
    assert _ids(idx_literal, "blue green") == [1, 2]


def test_schema_rows(idx_default, idx_literal):
    d = {r["name"]: r for r in pdb_schema(idx_default)}["arr"]
    # word-tokenized row: not the keyword/raw descriptor pair
    assert d["tokenizer"] != "keyword[lowercase=false]"
    assert d["normalizer"] != "raw"
    lit = {r["name"]: r for r in pdb_schema(idx_literal)}["arr"]
    assert lit["tokenizer"] == "keyword[lowercase=false]"
    assert lit["normalizer"] == "raw"
