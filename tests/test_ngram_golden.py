"""ngram.out golden (PUBLIC reference behavior): ngram tokenizer
options and gram-position query semantics.

- prefix_only=true emits only the grams anchored at position 0.
- positions=true requires min_gram == max_gram (each start position
  must emit exactly one gram for gram-phrases to be meaningful) and
  errors otherwise with the reference's message.
- With positions=true, phrase / proximity queries run over GRAM start
  positions: ### ARRAY['aaa','aab'] matches 'aaabbb' (grams at
  consecutive starts 0,1) but not in the reversed order; ordered
  proximity 'aaa' ##>2##> 'bbb' matches only 'aaabbb' while the
  unordered form matches 'bbbaaa' too.

Ref: pg_search/tests/pg_regress/expected/ngram.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.analysis import py_tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def test_prefix_only():
    assert py_tokenize("Tokenize me!", "ngram",
                       {"min_gram": 3, "max_gram": 3,
                        "prefix_only": True}) == ["tok"]


def test_full_grams():
    want = ["tok", "oke", "ken", "eni", "niz", "ize", "ze ", "e m",
            " me", "me!"]
    assert py_tokenize("Tokenize me!", "ngram",
                       {"min_gram": 3, "max_gram": 3}) == want
    # positions flag doesn't change the token stream
    assert py_tokenize("Tokenize me!", "ngram",
                       {"min_gram": 3, "max_gram": 3,
                        "positions": True}) == want


def test_positions_requires_equal_grams():
    with pytest.raises(ValueError,
                       match="min_gram must equal max_gram when "
                             "positions are enabled"):
        py_tokenize("Tokenize me!", "ngram",
                    {"min_gram": 3, "max_gram": 4, "positions": True})


@pytest.fixture(scope="module")
def pos_idx(spark):
    docs = spark.createDataFrame([(1, "aaabbb"), (2, "bbbaaa")],
                                 "id long, description string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="ngram",
                                 tokenizer_opts={"min_gram": 3,
                                                 "max_gram": 3,
                                                 "positions": True})]))


def _ids(idx, node):
    return sorted(r["doc_id"] for r in compile_query(idx, node).collect())


def test_gram_phrase_ordered(pos_idx):
    # ### ARRAY['aaa','aab']: grams at consecutive starts in 'aaabbb'
    assert _ids(pos_idx, ast.Phrase("description", ["aaa", "aab"])) == [1]
    # reversed order: no doc has 'aab' immediately before 'aaa'
    assert _ids(pos_idx, ast.Phrase("description", ["aab", "aaa"])) == []


def test_gram_proximity_ordered(pos_idx):
    # 'aaa' ##>2##> 'bbb': aaa@0, bbb@3 in 'aaabbb' only
    node = ast.Proximity("description", left="aaa", distance=2,
                         right="bbb", ordered=True)
    assert _ids(pos_idx, node) == [1]


def test_gram_proximity_unordered(pos_idx):
    # 'aaa' ##2## 'bbb': 'bbbaaa' has bbb@0, aaa@3 — matches too
    node = ast.Proximity("description", left="aaa", distance=2,
                         right="bbb", ordered=False)
    assert _ids(pos_idx, node) == [1, 2]
