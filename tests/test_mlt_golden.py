"""more_like_this.out golden (PUBLIC reference behavior): every result
set of pg_search/tests/pg_regress/expected/more_like_this.out ported —

- field-less mode draws terms from every indexed non-json, non-vector
  column (including the key and numeric columns as typed value terms)
- the SOURCE DOC IS INCLUDED (it matches its own terms)
- min_term_frequency / min_doc_frequency / max_doc_frequency /
  min_word_length / max_word_length / stopwords bounds
- max_query_terms keeps the LOWEST tf*idf terms (tantivy heap-eviction
  semantics): `max_query_terms => 2` over 'aaa bbb ccc' still matches
  the 'aaa aaa' docs, so the lowest-idf term survived the cap
- explicit json / vector fields raise; missing key returns empty
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

MLT_ROWS = [
    (1, "aaa bbb ccc", "foo bar", 1, '{"color": "aaa bbb ccc"}'),
    (2, "aaa aaa", "baz baz", 1, '{"color": "aaa aaa"}'),
    (3, "ddd eee fff", "foo foo foo", 2, '{"color": "ddd eee fff"}'),
    (4, "aaa aaa", "baz baz", 3, '{"color": "aaa aaa"}'),
]

VEC_ROWS = [
    (1, "aaa bbb ccc", [1.0, 2.0, 3.0]),
    (2, "aaa aaa", [4.0, 5.0, 6.0]),
    (3, "ddd eee fff", [7.0, 8.0, 9.0]),
]


@pytest.fixture(scope="module")
def mlt_index(spark):
    df = spark.createDataFrame(
        MLT_ROWS, "id int, text_field_a string, text_field_b string, "
        "numeric_field int, json_field string")
    return build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="text_field_a"),
                     FieldConfig(name="text_field_b"),
                     FieldConfig(name="json_field", tokenizer="json")]))


@pytest.fixture(scope="module")
def vec_index(spark):
    df = spark.createDataFrame(
        VEC_ROWS, "id int, description string, embedding array<double>")
    return build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")]))


def ids(index, q):
    return {r["doc_id"] for r in compile_query(index, q).collect()}


M = ast.MoreLikeThis


@pytest.mark.parametrize("kwargs,want", [
    # more_like_this.out:20-26 — field-less, source included
    (dict(), {1, 2, 3, 4}),
    # :29-35 field restriction
    (dict(fields=["text_field_a"]), {1, 2, 4}),
    (dict(fields=["text_field_b"]), {1, 3}),
    (dict(fields=["numeric_field"]), {1, 2}),
    # :64-76 min_doc_frequency
    (dict(min_doc_frequency=2), {1, 2, 3, 4}),
    (dict(min_doc_frequency=3), {1, 2, 4}),
    # :79-91 max_doc_frequency
    (dict(fields=["text_field_a"], max_doc_frequency=2), {1}),
    (dict(fields=["text_field_a"], max_doc_frequency=3), {1, 2, 4}),
    # :94-104 max_word_length
    (dict(fields=["text_field_a"], max_word_length=2), set()),
    (dict(fields=["text_field_a"], max_word_length=3), {1, 2, 4}),
    # :107-111 stopwords
    (dict(fields=["text_field_a"], stopwords=["aaa"]), {1}),
    # :114-120 max_query_terms keeps the LOWEST tf*idf terms: 'aaa'
    # (df=3, lowest idf) must survive the 2-term cap for docs 2 and 4
    # to match
    (dict(fields=["text_field_a"], max_query_terms=2), {1, 2, 4}),
])
def test_mlt_doc1(mlt_index, kwargs, want):
    assert ids(mlt_index, M(document_id=1, **kwargs)) == want


@pytest.mark.parametrize("kwargs,want", [
    # :51-61 min_term_frequency over doc 2 ('aaa aaa' / 'baz baz')
    (dict(min_term_frequency=2), {1, 2, 4}),
    (dict(min_term_frequency=3), set()),
])
def test_mlt_doc2(mlt_index, kwargs, want):
    assert ids(mlt_index, M(document_id=2, **kwargs)) == want


def test_mlt_json_field_errors(mlt_index):
    with pytest.raises(ValueError, match="json fields are not supported"):
        ids(mlt_index, M(document_id=1, fields=["json_field"]))


def test_mlt_missing_doc_empty(mlt_index):
    # :146-149 — document id doesn't exist
    assert ids(mlt_index, M(document_id=100)) == set()


def test_mlt_vector_skipped_fieldless(vec_index):
    # :160-176 — field-less mode skips vector columns (issue #5826)
    assert ids(vec_index, M(document_id=1)) == {1, 2}
    assert ids(vec_index, M(document_id=1, fields=["description"])) == \
        {1, 2}


def test_mlt_vector_field_errors(vec_index):
    with pytest.raises(ValueError, match="vector fields are not supported"):
        ids(vec_index, M(document_id=1, fields=["embedding"]))
