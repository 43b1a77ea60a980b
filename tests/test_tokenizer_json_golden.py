"""tokenizer-json.out golden (PUBLIC reference behavior, tables
replicated inline): json/jsonb columns through every search operator
(@@@ parse, &&& match-conj, ||| match-disj, ### phrase, === term) on a
JSON path — first with the default (unicode_words) value tokenizer,
then with per-column tokenizer casts (pdb.ngram(2,3) / pdb.whitespace):
the ngram-cast field still matches the tokenizing operators, ERRORS on
### (positions gating), and misses === (no raw 'value1' term among the
grams).  Also the paradedb.schema() dump: JsonObject type, expand_dots,
and the value-tokenizer descriptor strings.

Ref: pg_search/tests/pg_regress/expected/tokenizer-json.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import schema as pdb_schema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

J = '{"key1": "value1"}'
JB = '{"key2": "value2"}'


def _idx(spark, j_opts=None, jb_opts=None):
    docs = spark.createDataFrame([(1, J, JB)],
                                 "id long, j string, jb string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="j", tokenizer="json",
                        tokenizer_opts=j_opts or {}),
            FieldConfig(name="jb", tokenizer="json",
                        tokenizer_opts=jb_opts or {}),
        ]))


@pytest.fixture(scope="module")
def default_idx(spark):
    return _idx(spark)


@pytest.fixture(scope="module")
def cast_idx(spark):
    """Second index: j::pdb.ngram(2,3), jb::pdb.whitespace."""
    return _idx(spark,
                j_opts={"value_tokenizer": "ngram",
                        "min_gram": 2, "max_gram": 3,
                        "prefix_only": False},
                jb_opts={"value_tokenizer": "whitespace"})


def _ops(field, value):
    return {
        "@@@": ast.Parse(value, field=field),
        "&&&": ast.Match(field, value, conjunction_mode=True),
        "|||": ast.Match(field, value, conjunction_mode=False),
        "###": ast.TokenizedPhrase(field, value),
        "===": ast.Term(field, value),
    }


def _hits(idx, q):
    return [r["doc_id"] for r in compile_query(idx, q).collect()]


def test_schema_dump_default(default_idx):
    rows = {r["name"]: r for r in pdb_schema(default_idx)}
    for col in ("j", "jb"):
        assert rows[col]["field_type"] == "JsonObject"
        assert rows[col]["expand_dots"] is True
        assert rows[col]["fast"] is False
        assert rows[col]["tokenizer"] == "unicode_words_removeemojis:false"
        assert rows[col]["record"] == "position"
    assert rows["id"]["field_type"] == "I64"


def test_all_operators_on_default_json(default_idx):
    for op, q in _ops("j.key1", "value1").items():
        assert _hits(default_idx, q) == [1], op
    for op, q in _ops("jb.key2", "value2").items():
        assert _hits(default_idx, q) == [1], op


def test_schema_dump_with_casts(cast_idx):
    rows = {r["name"]: r for r in pdb_schema(cast_idx)}
    assert rows["j"]["tokenizer"] == \
        "ngram_mingram:2_maxgram:3_prefixonly:false"
    assert rows["jb"]["tokenizer"] == "whitespace"
    assert rows["j"]["field_type"] == "JsonObject"


def test_ngram_cast_json_operators(cast_idx):
    """j::pdb.ngram(2,3): tokenizing operators re-gram the needle and
    match; ### errors (ngram positions gating); === finds no raw term."""
    ops = _ops("j.key1", "value1")
    for op in ("@@@", "&&&", "|||"):
        assert _hits(cast_idx, ops[op]) == [1], op
    with pytest.raises(Exception, match="does not support this query"):
        _hits(cast_idx, ops["###"])
    assert _hits(cast_idx, ops["==="]) == []


def test_whitespace_cast_json_operators(cast_idx):
    """jb::pdb.whitespace: single-token value matches all five ops."""
    for op, q in _ops("jb.key2", "value2").items():
        assert _hits(cast_idx, q) == [1], op
