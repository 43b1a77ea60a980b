"""fuzzy.out golden (PUBLIC reference behavior): result rows and error
conditions of pg_search/tests/pg_regress/expected/fuzzy.out —

- ``=== 'sho'::pdb.fuzzy(d)``: FuzzyTerm at distance 0/1 finds nothing
  ('shoes' is 2 edits away), distance 2 finds the three shoes docs
- array operands: ``=== ARRAY[...]`` and ``||| ARRAY[...]`` are
  fuzzy-term disjunctions, ``&&& ARRAY[...]`` is a conjunction
- the typmod validates distance ∈ {0, 1, 2}

The reference's printed query JSON for these casts carries
``transposition_cost_one: false`` (classic Levenshtein), so the tests
pass that flag explicitly.
"""

import pytest

from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def ids(index, q):
    return {r["doc_id"] for r in compile_query(index, q).collect()}


def fz(value, d):
    return ast.Fuzzy("description", value, distance=d,
                     transposition_cost_one=False)


@pytest.mark.parametrize("d,want", [
    (0, set()),          # fuzzy.out:55-58 — no results
    (1, set()),          # fuzzy.out:60-63 — no results
    (2, {3, 4, 5}),      # fuzzy.out:65-71 — the three shoes docs
])
def test_fuzzy_term_distance(mock_index, d, want):
    assert ids(mock_index, fz("sho", d)) == want


def test_fuzzy_array_termset_disjunction(mock_index):
    # === ARRAY['sho', 'running']::pdb.fuzzy(2) → {3, 4, 5}
    q = ast.Boolean(should=[fz("sho", 2), fz("running", 2)])
    assert ids(mock_index, q) == {3, 4, 5}


def test_fuzzy_array_conjunction(mock_index):
    # &&& ARRAY['sho', 'running']::pdb.fuzzy(2) → {3}
    q = ast.Boolean(must=[fz("sho", 2), fz("running", 2)])
    assert ids(mock_index, q) == {3}


def test_fuzzy_array_disjunction(mock_index):
    # ||| ARRAY['sho', 'running']::pdb.fuzzy(2) → {3, 4, 5}
    q = ast.Boolean(should=[fz("sho", 2), fz("running", 2)])
    assert ids(mock_index, q) == {3, 4, 5}


@pytest.mark.parametrize("d", [-1, 3])
def test_fuzzy_distance_validation(mock_index, d):
    # fuzzy.out:168-171 — 'fuzzy value must be 0, 1, or 2'
    with pytest.raises(ValueError, match="fuzzy value must be 0, 1, or 2"):
        ids(mock_index, fz("beer", d))


def test_fuzzy_prefix_widens(mock_index):
    # prefix=true matches terms that extend the needle ('sho' as a
    # fuzzy prefix at distance 0 now matches 'shoes'); fuzzy.out pins
    # only that the two variants produce different tantivy queries
    q = ast.Fuzzy("description", "sho", distance=0, prefix=True,
                  transposition_cost_one=False)
    assert {3, 4, 5} <= ids(mock_index, q)
