"""Ports of four small tokenizer-surface pg_regress goldens:

- ``tokenizer-rhs-typmod.out`` — the text-query operators accept a
  tokenizer cast on the RIGHT-hand side (``t &&& 'hello'::pdb.ngram(5,
  6)``): the needle is tokenized with the cast's tokenizer instead of
  the field's analyzer, for ``&&&``, ``|||``, ``###`` and ``===``.
  (The golden's ``@@@``-rejects-rhs-cast section is a SQL type-system
  artifact — ``operator does not exist: text @@@ pdb.ngram`` — that is
  unrepresentable here: ``ast.Parse`` simply has no tokenizer slot.)
- ``tokenizer-typmod_cache.out`` — the tokenize-to-array surface:
  ``'hello, world'::pdb.ngram(66, 77)::text[]`` is empty (min_gram
  longer than the text) and stays empty on re-evaluation.  (The
  golden's role/permission sections exercise Postgres GRANT machinery
  on the shared typmod-cache TABLE — no analog: tokenizer typmods here
  are plain constructor arguments, not shared catalog state.)
- ``tokenizer-alias.out`` — indexing an expression WITHOUT an alias is
  rejected at build with the reference's error (``indexed expression
  requires a tokenizer cast with an alias: ...``), and the index does
  not come into existence.
- ``key-field-uuid-raw-warning.out`` — a UUID key field plus a json
  field configured with a raw tokenizer + lowercase normalizer, and a
  SECOND index field over the same json column via ``"column":
  "metadata_json"`` remapping, build cleanly.

Ref: pg_search/tests/pg_regress/expected/{tokenizer-rhs-typmod,
tokenizer-typmod_cache,tokenizer-alias,key-field-uuid-raw-warning}.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.analysis import py_tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

NG56 = {"min_gram": 5, "max_gram": 6}


@pytest.fixture(scope="module")
def rhs_idx(spark):
    docs = spark.createDataFrame([(1, "hello, world")], "id long, t string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="t")]))


def _ids(idx, q):
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


# --- tokenizer-rhs-typmod.out ------------------------------------------------

def test_rhs_cast_conjunction(rhs_idx):
    """t &&& 'hello'::pdb.ngram(5, 6) → row 1."""
    q = ast.Match("t", "hello", conjunction_mode=True,
                  tokenizer="ngram", tokenizer_opts=NG56)
    assert _ids(rhs_idx, q) == [1]


def test_rhs_cast_disjunction(rhs_idx):
    """t ||| 'hello'::pdb.ngram(5, 6) → row 1."""
    q = ast.Match("t", "hello", tokenizer="ngram", tokenizer_opts=NG56)
    assert _ids(rhs_idx, q) == [1]


def test_rhs_cast_phrase(rhs_idx):
    """t ### 'hello'::pdb.ngram(5, 6) → row 1."""
    q = ast.TokenizedPhrase("t", "hello", tokenizer="ngram",
                            tokenizer_opts=NG56)
    assert _ids(rhs_idx, q) == [1]


def test_rhs_cast_term(rhs_idx):
    """t === 'hello'::pdb.ngram(5, 6) → row 1."""
    q = ast.Term("t", "hello", tokenizer="ngram", tokenizer_opts=NG56)
    assert _ids(rhs_idx, q) == [1]


def test_rhs_cast_term_multi_token_is_termset(rhs_idx):
    """A multi-token RHS cast on === becomes a TermSet (eqeqeq.rs
    term_set_str): 'hello world'::pdb.simple → {hello, world} — both
    terms hit row 1, constant score."""
    q = ast.Term("t", "hello world", tokenizer="simple")
    rows = compile_query(rhs_idx, q).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["score"] == 1.0


def test_rhs_cast_no_tokens_matches_nothing(rhs_idx):
    """An RHS cast that yields no tokens matches no rows (ngram min
    longer than the needle)."""
    q = ast.Term("t", "hello", tokenizer="ngram",
                 tokenizer_opts={"min_gram": 66, "max_gram": 77})
    assert _ids(rhs_idx, q) == []


# --- tokenizer-typmod_cache.out ----------------------------------------------

def test_oversized_ngram_typmod_empty_array():
    """'hello, world'::pdb.ngram(66, 77)::text[] → {} — and a second
    evaluation (the golden's ABORT-then-retry) is identically empty."""
    opts = {"min_gram": 66, "max_gram": 77}
    assert py_tokenize("hello, world", "ngram", opts) == []
    assert py_tokenize("hello, world", "ngram", opts) == []


# --- tokenizer-alias.out -----------------------------------------------------

def test_indexed_expression_requires_alias(spark):
    docs = spark.createDataFrame(
        [(1, "the title", "the description")],
        "id long, title string, description string")
    with pytest.raises(ValueError,
                       match=r"indexed expression requires a tokenizer "
                             r"cast with an alias"):
        build_index(docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(
                name="title || ' ' || description", tokenizer="simple")]))


def test_indexed_expression_with_alias_builds(spark):
    """The fix the golden implies: the same expression WITH an alias
    (source=) builds and the combined text is searchable."""
    docs = spark.createDataFrame(
        [(1, "the title", "the description")],
        "id long, title string, description string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title_desc",
                                 source="title || ' ' || description",
                                 tokenizer="simple")]))
    assert _ids(idx, ast.Match("title_desc", "description")) == [1]


# --- key-field-uuid-raw-warning.out ------------------------------------------

def test_uuid_key_json_raw_and_column_remap(spark):
    docs = spark.createDataFrame(
        [("550e8400-e29b-41d4-a716-446655440000",
          '{"Tag": "Alpha"}'),
         ("6ba7b810-9dad-11d1-80b4-00c04fd430c8",
          '{"Tag": "Beta"}')],
        "id string, metadata_json string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="metadata_json", tokenizer="json",
                        tokenizer_opts={"value_tokenizer": "raw"},
                        lowercase=True),
            FieldConfig(name="metadata_json_new", source="metadata_json",
                        tokenizer="json",
                        tokenizer_opts={"value_tokenizer": "keyword"},
                        lowercase=True)]))
    # both index fields resolve; the raw+lowercase normalizer means the
    # stored term is the lowercased whole value
    assert _ids(idx, ast.Term("metadata_json.Tag", "alpha")) == \
        ["550e8400-e29b-41d4-a716-446655440000"]
    assert _ids(idx, ast.Term("metadata_json_new.Tag", "beta")) == \
        ["6ba7b810-9dad-11d1-80b4-00c04fd430c8"]
