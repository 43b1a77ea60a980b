"""JSON wire-format round-trip fuzzing: serialize seeded random query
ASTs to the reference's SearchQueryInput JSON (the ``::jsonb`` operand
/ EXPLAIN ``Tantivy Query:`` shape) and parse them back.

Two properties per seed:
- **fixed point**: ``to_json(from_json(to_json(q))) == to_json(q)`` —
  one canonicalizing round trip, then the wire form is stable (exact
  AST equality is too strict only for unbounded range bounds, whose
  inclusive flag is meaningless and normalizes away);
- **result identity**: the round-tripped AST compiles to the same
  (doc_id, score) set as the original on the mock corpus.

Ref: pg_search/src/query/mod.rs (SearchQueryInput serde),
     pg_search/src/query/pdb_query.rs (pdb::Query serde)
"""

import json
import random

import pytest

from sparksearch.query.compiler import compile_query
from sparksearch.query.json_input import from_json, to_json
from tests.test_querygen_fuzz import gen_query


@pytest.mark.parametrize("seed", range(40))
def test_wire_roundtrip_fixed_point(seed):
    q = gen_query(random.Random(7000 + seed))
    wire = to_json(q)
    # the wire form is valid JSON
    s = json.dumps(wire)
    back = from_json(s)
    assert to_json(back) == wire, f"seed {seed}"


@pytest.mark.parametrize("seed", range(0, 40, 5))
def test_wire_roundtrip_result_identity(mock_index, seed):
    q = gen_query(random.Random(7000 + seed))
    back = from_json(json.dumps(to_json(q)))
    want = {(r["doc_id"], round(r["score"], 4))
            for r in compile_query(mock_index, q).collect()}
    got = {(r["doc_id"], round(r["score"], 4))
           for r in compile_query(mock_index, back).collect()}
    assert got == want, f"seed {seed}"
