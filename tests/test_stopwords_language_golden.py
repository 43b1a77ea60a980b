"""tokenizer-stopwords-language.out golden (PUBLIC reference behavior,
table replicated inline): a ``pdb.simple('stopwords_language=english')``
field drops English stopwords at index AND query time — a query made
ONLY of stopwords errors in the parser (@@@, Tantivy's clause-less
rewrite rejection, reference error string), matches nothing through the
builder operators (&&&, |||, ###, ===), and a mixed query still finds
the row through its surviving terms.

Ref: pg_search/tests/pg_regress/expected/tokenizer-stopwords-language.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import QueryParseError, parse_query


@pytest.fixture(scope="module")
def sw_index(spark):
    docs = spark.createDataFrame(
        [(1, "how many of these are in the stopwords list?")],
        "id long, t string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(
            name="t", tokenizer="simple",
            filters=[("stopwords_language", "english")])]))


def _ids(idx, node):
    return sorted(r[0] for r in
                  compile_query(idx, node).select("doc_id").collect())


def test_all_stopword_parse_errors(sw_index):
    # @@@ 'are in the' -> runtime parse error, reference text
    with pytest.raises(QueryParseError,
                       match=r"could not parse query string "
                             r"'t:\(are in the\)'. make sure to use "
                             r"column:term pairs, and to capitalize "
                             r"AND/OR."):
        parse_query("are in the", default_field="t",
                    index_schema=sw_index.schema)


def test_mixed_query_finds_row(sw_index):
    node = parse_query("are in the stopwords list?", default_field="t",
                       index_schema=sw_index.schema)
    assert _ids(sw_index, node) == [1]


def test_match_operators_all_stopwords_empty(sw_index):
    # &&& / ||| of stopwords-only text match nothing (no error)
    assert _ids(sw_index, ast.Match("t", "are in the",
                                    conjunction_mode=True)) == []
    assert _ids(sw_index, ast.Match("t", "are in the")) == []


def test_phrase_all_stopwords_empty(sw_index):
    # ### of stopwords-only text matches nothing
    assert _ids(sw_index, ast.Phrase("t", ["are", "in", "the"])) == []


def test_term_stopword_empty(sw_index):
    # === 'are': raw needle, but the term was never indexed
    assert _ids(sw_index, ast.Term("t", "are")) == []


def test_surviving_terms_match_all_operators(sw_index):
    node = parse_query("stopwords list?", default_field="t",
                       index_schema=sw_index.schema)
    assert _ids(sw_index, node) == [1]
    assert _ids(sw_index, ast.Match("t", "stopwords list?",
                                    conjunction_mode=True)) == [1]
    assert _ids(sw_index, ast.Match("t", "stopwords list?")) == [1]
    assert _ids(sw_index, ast.Phrase("t", ["stopwords", "list?"])) == [1]
    assert _ids(sw_index, ast.Term("t", "stopwords")) == [1]
