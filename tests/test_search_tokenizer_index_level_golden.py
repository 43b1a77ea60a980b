"""search_tokenizer_index_level.out golden (PUBLIC reference behavior,
tables replicated inline): the index-LEVEL ``search_tokenizer`` WITH
option — a default search-time analyzer for every field — including a
parameterized form ('simple(lowercase=false)'), the query-level
tokenizer cast overriding it, and the per-field typmod rejection.

Ref: pg_search/tests/pg_regress/expected/search_tokenizer_index_level.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def autocomplete(spark):
    docs = spark.createDataFrame(
        [(1, "shoes"), (2, "shirt"), (3, "shorts"), (4, "shoelaces"),
         (5, "socks")], "id long, title string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(
            name="title", tokenizer="ngram",
            tokenizer_opts={"min_gram": 1, "max_gram": 10,
                            "prefix_only": True})],
        search_tokenizer="unicode_words"))


def _ids(idx, q):
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


def test_1_sho_stays_one_token(autocomplete):
    """'sho' is NOT re-grammed at search time -> prefix-gram matches."""
    assert _ids(autocomplete, ast.Match("title", "sho")) == [1, 3, 4]


def test_1_single_char_prefix(autocomplete):
    assert _ids(autocomplete, ast.Match("title", "s")) == [1, 2, 3, 4, 5]


def test_2_query_level_cast_overrides_index_level(autocomplete):
    """'sho'::pdb.ngram(1,10,prefix_only) re-grams the needle into
    s, sh, sho -> the 's' gram alone matches every title."""
    q = ast.Match("title", "sho", tokenizer="ngram",
                  tokenizer_opts={"min_gram": 1, "max_gram": 10,
                                  "prefix_only": True})
    assert _ids(autocomplete, q) == [1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def param_idx(spark):
    docs = spark.createDataFrame(
        [(1, "Running Fast"), (2, "running slow"), (3, "RUNNING late")],
        "id long, content string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="content")],
        search_tokenizer="simple(lowercase=false)"))


def test_3_parameterized_search_tokenizer(param_idx):
    """simple(lowercase=false): 'Running' is not lowered at search time
    so it misses the (lowered) index terms; 'running' matches all 3."""
    assert _ids(param_idx, ast.Match("content", "Running")) == []
    assert _ids(param_idx, ast.Match("content", "running")) == [1, 2, 3]


def test_4_search_tokenizer_rejected_as_typmod(spark):
    """search_tokenizer is an index-level WITH option, not a per-field
    tokenizer param."""
    docs = spark.createDataFrame([(1, "shoes")], "id long, title string")
    with pytest.raises(ValueError,
                       match="Invalid option: 'search_tokenizer'"):
        build_index(docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(
                name="title", tokenizer="ngram",
                tokenizer_opts={"min_gram": 1, "max_gram": 10,
                                "search_tokenizer": "unicode_words"})]))
