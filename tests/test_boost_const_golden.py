"""boost.out / const_score.out parity — pdb.boost / pdb.const typmod.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/boost.out and
const_score.out.  Both goldens pin the typmod-cast encoding of the score
adjustment value (api/operator/boost.rs:157-175, const_score.rs):

- the value round-trips through a 16-bit float: boost(3.14159) encodes
  3.140625;
- out-of-bounds values clamp to [-2048..2048]; Inf clamps to 2048;
- a non-numeric value errors 'invalid boost value: X'; NaN errors 'only
  16 bit floats in the range [-2048..2048] are supported';
- a cast with no value errors (score adjustment must be set) — the DSL
  constructors always take the value, so that arm is
  construction-impossible here by design.

The goldens only pin the query REPRESENTATION (EXPLAIN JSON); the score
semantics of the encoded value (multiply for Boost, replace for Const)
are asserted against the unadjusted query's scores on mock_items.
"""

import pytest

from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


# -- typmod encoding (boost.out:345-381, const_score.out mirrors) -----

def test_boost_f16_quantization():
    assert ast.boost_typmod(ast.Term("description", "foo"),
                            "3.14159").factor == 3.140625
    assert ast.boost_typmod(ast.All(), 3).factor == 3.0
    assert ast.boost_typmod(ast.All(), 0.5).factor == 0.5


def test_boost_clamping():
    assert ast.boost_typmod(ast.All(), 2049).factor == 2048.0
    assert ast.boost_typmod(ast.All(), -2049).factor == -2048.0
    assert ast.boost_typmod(ast.All(), float("inf")).factor == 2048.0
    assert ast.boost_typmod(ast.All(), float("-inf")).factor == -2048.0


def test_const_typmod_same_encoding():
    assert ast.const_typmod(ast.All(), "3.14159").score == 3.140625
    assert ast.const_typmod(ast.All(), 2049).score == 2048.0
    assert ast.const_typmod(ast.All(), float("inf")).score == 2048.0


# -- error cases (boost.out:385-392, const_score.out mirrors) ---------

def test_invalid_value_errors():
    with pytest.raises(ValueError, match="invalid boost value: hi_mom"):
        ast.boost_typmod(ast.All(), "hi_mom")
    with pytest.raises(ValueError, match="invalid const value: hi_mom"):
        ast.const_typmod(ast.All(), "hi_mom")


def test_nan_errors():
    err = r"only 16 bit floats in the range \[-2048..2048\] are supported"
    with pytest.raises(ValueError, match=err):
        ast.boost_typmod(ast.All(), float("nan"))
    with pytest.raises(ValueError, match=err):
        ast.const_typmod(ast.All(), "NaN")


# -- encoded value drives scoring -------------------------------------

def _scores(idx, q):
    return {r["doc_id"]: r["score"] for r in
            compile_query(idx, q).select("doc_id", "score").collect()}


def test_boost_multiplies_scores(mock_index):
    base = _scores(mock_index, ast.Term("description", "shoes"))
    boosted = _scores(mock_index,
                      ast.boost_typmod(ast.Term("description", "shoes"),
                                       "3.14159"))
    assert set(boosted) == set(base) and len(base) == 3
    for d, s in boosted.items():
        assert s == pytest.approx(base[d] * 3.140625, rel=1e-6)


def test_const_replaces_scores(mock_index):
    got = _scores(mock_index,
                  ast.const_typmod(ast.Term("description", "shoes"), 2049))
    assert len(got) == 3
    assert all(s == 2048.0 for s in got.values())


def test_negative_boost_is_preserved(mock_index):
    # boost.out pins Boost(-100.0): negative factors are legal and kept
    got = _scores(mock_index,
                  ast.boost_typmod(ast.Term("description", "shoes"), -100))
    base = _scores(mock_index, ast.Term("description", "shoes"))
    for d, s in got.items():
        assert s == pytest.approx(base[d] * -100.0, rel=1e-6)
