"""issue_4610.out golden (PUBLIC reference behavior): a parameterized
LIMIT must still run the TopK path and return the same rows + scores
as a constant LIMIT.

The reference's bug was plan-cache-specific (a `$2` LIMIT lost the
TopK exec method); the portable contract is the result: on mock_items,
``pdb.parse('description:keyboard') ORDER BY score DESC LIMIT $n``
returns ids 2, 1 with float8-cast scores 3.266859531402588 /
2.821378707885742 for any way the limit is supplied.

Ref: pg_search/tests/pg_regress/expected/issue_4610.out
"""

import pytest

from sparksearch.query import ast
from sparksearch.query.search import search

# the golden's float8 (double) renderings of the float32 scores
GOLD = [(2, 3.266859531402588), (1, 2.821378707885742)]


def _page(mock_index, limit):
    rows = search(mock_index, ast.Parse("description:keyboard"),
                  limit=limit, order_by=[("score", "desc"), ("id", "asc")],
                  columns=["id"]).collect()
    return [(r["id"], float(r["score"])) for r in rows]


@pytest.mark.parametrize("limit", [5, 5, 2])  # param re-exec + const form
def test_param_and_const_limit_same_scores(mock_index, limit):
    got = _page(mock_index, limit)
    assert got == GOLD[:limit]


def test_reexecution_stable(mock_index):
    """The golden EXECUTEs the prepared query twice; rows identical."""
    assert _page(mock_index, 5) == _page(mock_index, 5) == GOLD
