"""tokenize-uuid.out golden (PUBLIC reference behavior): UUID columns
default to the keyword tokenizer WITHOUT lowercasing (raw normalizer) —
UUIDs index verbatim as single terms; an explicit ::pdb.unicode_words
cast re-tokenizes them into hex words; an alias renames the schema
entry.  paradedb.schema() exposes the tokenizer descriptor strings.

Ref: pg_search/tests/pg_regress/expected/tokenize-uuid.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import schema as schema_rows
from sparksearch.analysis import py_tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

UUIDS = [
    "123e4567-e89b-12d3-a456-426614174000",
    "987fcdeb-51a2-43e8-b567-890123456789",
    "a1b2c3d4-e5f6-47a8-89b0-123456789abc",
    "b2c3d4e5-f6a7-48b9-90c1-23456789abcd",
    "c3d4e5f6-a7b8-49c0-01d2-3456789abcde",
]


@pytest.fixture(scope="module")
def uuid_docs(spark):
    return spark.createDataFrame(list(enumerate(UUIDS, 1)),
                                 "id long, uuid string")


def test_default_is_keyword_without_lowercase(uuid_docs):
    # verify default is literal: keyword[lowercase=false], raw normalizer
    idx = build_index(uuid_docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="uuid", tokenizer="keyword",
                                 lowercase=False)]))
    rows = {r["name"]: r for r in schema_rows(idx)}
    assert rows["uuid"]["tokenizer"] == "keyword[lowercase=false]"
    assert rows["uuid"]["normalizer"] == "raw"
    assert rows["uuid"]["record"] == "position"
    # the whole UUID is one verbatim term
    got = compile_query(idx, ast.Term("uuid", UUIDS[0])).count()
    assert got == 1


def test_unicode_words_retokenizes(uuid_docs):
    idx = build_index(uuid_docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="uuid",
                                 tokenizer="unicode_words")]))
    rows = {r["name"]: r for r in schema_rows(idx)}
    assert rows["uuid"]["tokenizer"] == \
        "unicode_words_removeemojis:false"
    # hex words are individually searchable now
    assert compile_query(idx, ast.Term("uuid", "123e4567")).count() == 1
    toks = py_tokenize(UUIDS[0], "unicode_words")
    assert toks[0] == "123e4567" and len(toks) == 5


def test_alias_renames_schema_entry(uuid_docs):
    idx = build_index(uuid_docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="uuid_words", source="uuid",
                                 tokenizer="unicode_words",
                                 tokenizer_opts={"remove_emojis": True})]))
    rows = {r["name"]: r for r in schema_rows(idx)}
    assert "uuid_words" in rows and "uuid" not in rows
    assert rows["uuid_words"]["tokenizer"] == \
        "unicode_words_removeemojis:true"
    assert compile_query(idx, ast.Term("uuid_words", "e89b")).count() == 1
