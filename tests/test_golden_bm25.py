"""BM25 golden parity against the reference's pg_regress expected output.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/topk_scores.out
(the canonical mock_items corpus + default tokenizer).  Scores must match
the printed float32 values to ~1e-6.
"""

import pytest

from sparksearch.query import ast, search
from sparksearch.query.search import count

GOLDEN_QUERY = ast.Boolean(should=[
    ast.Parse("keyboard", field="description"),
    ast.Boolean(must=[
        ast.Parse("shoes", field="description"),
        ast.Range("rating", lower=2, lower_inclusive=False),
    ]),
])


def _run(mock_index, order_by):
    res = search(mock_index, GOLDEN_QUERY, limit=5, order_by=order_by,
                 columns=["id", "description", "rating"]).collect()
    return [(r["id"], r["rating"], round(r["score"], 6)) for r in res]


def test_topk_scores_rating_desc(mock_index):
    # expected/topk_scores.out:30-37
    got = _run(mock_index, [("rating", "desc"), ("score", "desc")])
    assert [g[0] for g in got] == [3, 5, 2, 1, 4]
    scores = {g[0]: g[2] for g in got}
    assert scores[3] == pytest.approx(3.4849067, abs=2e-6)
    assert scores[5] == pytest.approx(3.8772602, abs=2e-6)
    assert scores[2] == pytest.approx(3.2668595, abs=2e-6)
    assert scores[1] == pytest.approx(2.8213787, abs=2e-6)
    assert scores[4] == pytest.approx(3.4849067, abs=2e-6)


def test_topk_scores_rating_id_asc(mock_index):
    # expected/topk_scores.out:58-66
    got = _run(mock_index, [("rating", "asc"), ("id", "asc")])
    assert [g[0] for g in got] == [4, 1, 2, 5, 3]


def test_score_order_topk(mock_index):
    got = _run(mock_index, [("score", "desc"), ("id", "asc")])
    assert [g[0] for g in got] == [5, 3, 4, 2, 1]


def test_count(mock_index):
    assert count(mock_index, GOLDEN_QUERY) == 5
    assert count(mock_index, ast.Term("description", "shoes")) == 3
    assert count(mock_index, ast.All()) == 41
    assert count(mock_index, ast.Empty()) == 0


def test_single_term_scores(mock_index):
    res = search(mock_index, ast.Term("description", "keyboard"),
                 columns=["id"]).collect()
    scores = {r["id"]: r["score"] for r in res}
    assert set(scores) == {1, 2}
    assert scores[1] == pytest.approx(2.8213787, abs=2e-6)
    assert scores[2] == pytest.approx(3.2668595, abs=2e-6)


def test_keyword_field_exact(mock_index):
    # category indexed with keyword tokenizer → whole value is one token
    res = search(mock_index, ast.Term("category", "Electronics"),
                 columns=["id"]).collect()
    assert len(res) == 5
