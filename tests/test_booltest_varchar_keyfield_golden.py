"""Three small reference goldens in one module (PUBLIC reference
behavior, tables replicated inline):

- with_booltest_heap_fallback.out: a BOOLEAN qual (``flag IS TRUE``)
  composed with a search predicate stays inside the scan as a heap
  filter — the Tantivy query wraps the indexed query with
  ``heap_filter`` field_filters, our HeapFilter AST.
- varchar_text_casts.out: tokenizer functions and query-builder field
  references accept text/varchar interchangeably (one string type on
  Spark — the golden pins identical row sets for both cast spellings).
- key-field-text-as-keyword.out: a TEXT key field configured with the
  keyword tokenizer shows in paradedb.schema() as Str / fast /
  keyword[lowercase=false] / raw normalizer.

Ref: pg_search/tests/pg_regress/expected/{with_booltest_heap_fallback,
varchar_text_casts,key-field-text-as-keyword}.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import schema as pdb_schema
from sparksearch.api import tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


# --- with_booltest_heap_fallback.out ---------------------------------

@pytest.fixture(scope="module")
def booltest_index(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", True), (2, "hello parade", False),
         (3, "other text", True)],
        "id long, description string, flag boolean")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")])), docs


def test_booltest_is_true_heap_filter(booltest_index):
    idx, _ = booltest_index
    node = ast.HeapFilter(
        query=ast.Parse("hello", field="description"),
        predicate="flag IS TRUE")
    got = sorted(r[0] for r in
                 compile_query(idx, node).select("doc_id").collect())
    assert got == [1]


def test_booltest_is_not_true(booltest_index):
    # IS NOT TRUE matches false AND NULL rows (three-valued logic)
    idx, _ = booltest_index
    node = ast.HeapFilter(
        query=ast.Parse("hello", field="description"),
        predicate="flag IS NOT TRUE")
    got = sorted(r[0] for r in
                 compile_query(idx, node).select("doc_id").collect())
    assert got == [2]


# --- varchar_text_casts.out ------------------------------------------

def test_tokenize_unicode_words_casts(spark):
    # pdb.tokenize_unicode_words('good job'::varchar / ::text)
    toks = [r["token"] for r in
            tokenize(spark, "unicode_words", "good job").collect()]
    assert toks == ["good", "job"]


def test_phrase_field_reference(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "a c")],
                                 "id long, content string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="content",
                                 tokenizer="unicode_words")]))
    got = sorted(r[0] for r in compile_query(
        idx, ast.Phrase("content", ["a", "b"]))
        .select("doc_id").collect())
    assert got == [1]


# --- key-field-text-as-keyword.out ------------------------------------

def test_text_key_field_schema_row(spark):
    docs = spark.createDataFrame(
        [("k1", "alpha"), ("k2", "beta")], "id string, data string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="id", tokenizer="keyword",
                                 lowercase=False),
                     FieldConfig(name="data")]))
    rows = {r["name"]: r for r in pdb_schema(idx)}
    kid = rows["id"]
    assert kid["field_type"] == "Str"
    assert kid["fast"] is True
    assert kid["tokenizer"] == "keyword[lowercase=false]"
    assert kid["normalizer"] == "raw"
    # the data row keeps its own (word) tokenizer descriptor
    assert rows["data"]["tokenizer"] != "keyword[lowercase=false]"
    assert rows["data"]["normalizer"] != "raw"


def test_text_key_without_config_defaults_keyword(spark):
    # a TEXT key with no explicit text_fields entry still reports the
    # keyword tokenizer + raw normalizer (the AM's forced key config)
    docs = spark.createDataFrame(
        [("k1", "alpha")], "id string, data string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="data")]))
    kid = {r["name"]: r for r in pdb_schema(idx)}["id"]
    assert (kid["field_type"], kid["tokenizer"], kid["normalizer"]) == \
        ("Str", "keyword[lowercase=false]", "raw")
