"""require_positions.out golden (PUBLIC reference behavior): every
positional query type — tokenized phrase (###), proximity (##>),
phrase, phrase_prefix, regex_phrase — ERRORS against a field tokenized
with ngram (whose positions are gram indexes, not word positions,
unless the tokenizer's `positions` option is set).  The reference
raises instead of silently returning empty or garbled matches; so do
we, with the same tokenizer-description message shape.

Ref: pg_search/tests/pg_regress/expected/require_positions.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def ngram_idx(spark):
    docs = spark.createDataFrame([(1, "AAABBB"), (2, "BBBAAA")],
                                 "id long, t string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="t", tokenizer="ngram",
                                 tokenizer_opts={"min_gram": 3,
                                                 "max_gram": 3})]))
    return idx


POSITIONAL = [
    ast.TokenizedPhrase("t", "aaa"),                      # t ### 'aaa'
    ast.Phrase("t", ["aaa"]),                             # pdb.phrase
    ast.PhrasePrefix("t", ["aaa", "b"]),                  # phrase_prefix
    ast.RegexPhrase("t", ["a.*", "bbb"]),                 # regex_phrase
]


@pytest.mark.parametrize("node", POSITIONAL,
                         ids=lambda n: type(n).__name__)
def test_positional_queries_error_on_ngram(ngram_idx, node):
    with pytest.raises(ValueError,
                       match=r"tokenized with 'ngram_mingram:3_maxgram:3"
                             r"_prefixonly:false' which does not support "
                             r"this query type"):
        compile_query(ngram_idx, node).collect()


def test_proximity_errors_on_ngram(ngram_idx):
    # t @@@ ('aaa' ##>1##> 'bbb')
    prox = ast.Proximity("t", left="aaa", distance=1, right="bbb",
                         ordered=True)
    with pytest.raises(ValueError, match="does not support this query"):
        compile_query(ngram_idx, prox).collect()


def test_nonpositional_queries_still_work(ngram_idx):
    # term queries over grams are fine — only POSITIONAL types error
    got = sorted(r["doc_id"] for r in
                 compile_query(ngram_idx, ast.Term("t", "aab")).collect())
    assert got == [1]
    got = sorted(r["doc_id"] for r in
                 compile_query(ngram_idx, ast.Term("t", "aaa")).collect())
    assert got == [1, 2]


def test_positions_optin_restores_phrase(spark):
    # the reference's NgramTokenizer(positions=true) records real word
    # positions; the opt-in lifts the error
    docs = spark.createDataFrame([(1, "AAABBB")], "id long, t string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="t", tokenizer="ngram",
                                 tokenizer_opts={"min_gram": 3,
                                                 "max_gram": 3,
                                                 "positions": True})]))
    # no error; gram-position phrase semantics
    compile_query(idx, ast.Phrase("t", ["aaa"])).collect()
