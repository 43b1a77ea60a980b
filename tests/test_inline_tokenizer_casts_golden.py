"""inline_tokenizer_casts.out golden (PUBLIC reference behavior,
mock_items corpus): score semantics of inline cast chains on the &&&
operator — bare match scores, ::pdb.boost(3) as an f32 multiply, and
::pdb.const(5) replacing every score.  (The reference also prints the
cast chains' internal JSON debug rendering — planner-internal, not
ported.)

Ref: pg_search/tests/pg_regress/expected/inline_tokenizer_casts.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def idx(spark):
    return build_index(mock_items(spark), IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category")]))


def _scores(idx, q):
    return sorted((r["doc_id"], np.float32(r["score"]))
                  for r in compile_query(idx, q).collect())


BASE = [(3, 2.4849067), (4, 2.4849067), (5, 2.8772602)]


def test_match_conjunction_base_scores(idx):
    got = _scores(idx, ast.Match("description", "shoes",
                                 conjunction_mode=True))
    assert got == [(i, np.float32(s)) for i, s in BASE]


def test_boost_cast_multiplies(idx):
    q = ast.Boost(ast.Match("description", "shoes",
                            conjunction_mode=True, tokenizer="whitespace"),
                  3.0)
    got = _scores(idx, q)
    assert got == [(i, np.float32(np.float32(s) * np.float32(3.0)))
                   for i, s in BASE]
    assert [float(s) for _, s in got] == \
        pytest.approx([7.45472, 7.45472, 8.631781], abs=2e-6)


def test_const_cast_replaces(idx):
    q = ast.ConstScore(ast.Match("description", "shoes",
                                 conjunction_mode=True,
                                 tokenizer="whitespace"), 5.0)
    got = _scores(idx, q)
    assert got == [(3, 5.0), (4, 5.0), (5, 5.0)]
