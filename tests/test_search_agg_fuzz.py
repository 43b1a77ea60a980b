"""Compositional differential fuzzing: random search query × random
aggregation, through the public ``paradedb.aggregate`` analog
``search_aggregate`` (reference: api/aggregate.rs runs the agg over the
query's match set; datetime_stability.out §9 drives it through SQL).

The two generators and their two INDEPENDENT oracles already exist —
querygen (tests/test_querygen_fuzz.gen_query + tests.oracle.evaluate)
and the agg DSL fuzz (tests/test_aggs_fuzz.gen_bucket + its pandas
oracle).  Composing them exercises exactly the seam the round-3 advisor
flagged (key-column preservation when the agg references the key field
over a match-set join) plus the empty-match-set envelope and zero-count
defined-bucket fills under real query filters.
"""

import random

import pytest

from sparksearch.aggs import search_aggregate
from sparksearch.fixtures import (mock_items_index_schema, mock_items_pdf)
from tests.oracle import PyIndex, evaluate
from tests.test_aggs_fuzz import check_level, gen_bucket
from tests.test_querygen_fuzz import gen_query


@pytest.fixture(scope="module")
def pidx():
    return PyIndex(mock_items_pdf().to_dict("records"), "id",
                   mock_items_index_schema())


@pytest.mark.parametrize("seed", range(30))
def test_random_query_times_random_agg(mock_index, pidx, seed):
    rng = random.Random(7000 + seed)
    q = gen_query(rng)
    spec = {"a0": gen_bucket(rng)}
    env = search_aggregate(mock_index, q, spec)["aggregations"]["a0"]
    matched = set(evaluate(pidx, q))
    pdf = mock_items_pdf()
    sub = pdf[pdf["id"].isin(matched)]
    check_level(env, sub, spec["a0"], f"seed{seed} q={q}")


def test_agg_on_key_field_over_match_set(mock_index):
    """The advisor's exact repro: an agg referencing the KEY field via
    the public aggregate path must stay addressable after the match-set
    join (value_count on the key = number of matches)."""
    from sparksearch.query import ast
    env = search_aggregate(mock_index, ast.All(),
                           {"n": {"value_count": {"field": "id"}}})
    assert env["aggregations"]["n"]["value"] == float(len(mock_items_pdf()))
