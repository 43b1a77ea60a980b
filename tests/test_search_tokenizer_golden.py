"""search_tokenizer.out golden (PUBLIC reference behavior): a
per-field QUERY-TIME tokenizer override — the autocomplete pattern.
Index time uses prefix ngrams ("shoes" → s, sh, sho, shoe, shoes);
search time uses unicode_words, so the needle 'sho' stays ONE token
and matches only titles whose prefix grams include 'sho'.  Without the
override the needle is re-ngrammed and over-matches.  An explicit
per-query tokenizer cast overrides even the field-level
search_tokenizer.

Ref: pg_search/tests/pg_regress/expected/search_tokenizer.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

TITLES = [(1, "shoes"), (2, "shirt"), (3, "shorts"), (4, "shoelaces"),
          (5, "socks")]

_PREFIX_NGRAM = {"min_gram": 1, "max_gram": 10, "prefix_only": True}


@pytest.fixture(scope="module")
def auto_idx(spark):
    docs = spark.createDataFrame(TITLES, "id long, title string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(
            name="title", tokenizer="ngram",
            tokenizer_opts=dict(_PREFIX_NGRAM),
            search_tokenizer="unicode_words")]))


@pytest.fixture(scope="module")
def plain_idx(spark):
    # the SAME index WITHOUT search_tokenizer
    docs = spark.createDataFrame(TITLES, "id long, title string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title", tokenizer="ngram",
                                 tokenizer_opts=dict(_PREFIX_NGRAM))]))


def _ids(idx, node):
    return sorted(r["doc_id"] for r in compile_query(idx, node).collect())


def test_sho_stays_one_token(auto_idx):
    # 'sho' → one token → only titles with the 'sho' prefix gram
    assert _ids(auto_idx, ast.Match("title", "sho")) == [1, 3, 4]


def test_s_matches_every_s_title(auto_idx):
    assert _ids(auto_idx, ast.Match("title", "s")) == [1, 2, 3, 4, 5]


def test_explicit_cast_overrides_search_tokenizer(auto_idx):
    # 'sho'::pdb.ngram(1,10,'prefix_only=true') → s, sh, sho →
    # disjunction matches all 5 titles
    node = ast.Match("title", "sho", tokenizer="ngram",
                     tokenizer_opts=dict(_PREFIX_NGRAM))
    assert _ids(auto_idx, node) == [1, 2, 3, 4, 5]


def test_without_search_tokenizer_overmatches(plain_idx):
    # the contrast case: the plain index re-ngrams the needle, so
    # 'sho' matches every title (all contain the 's' gram)
    assert _ids(plain_idx, ast.Match("title", "sho")) == [1, 2, 3, 4, 5]


def test_parser_uses_search_tokenizer(auto_idx):
    from sparksearch.query.parser import parse_query
    node = parse_query("sho", "title", auto_idx.schema)
    assert _ids(auto_idx, node) == [1, 3, 4]
