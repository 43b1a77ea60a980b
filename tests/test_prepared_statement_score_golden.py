"""prepared_statement_score.out golden (PUBLIC reference behavior):
pdb.score() must be identical across repeated executions of the same
parameterized query and across plan modes (custom vs generic plans —
the reference's 6th-execution generic-plan switch used to NULL the
scores).  Spark restatement: recompiling the same AST repeatedly and
with an extra always-true parameter clause yields bit-identical
float32 scores.

Ref: pg_search/tests/pg_regress/expected/prepared_statement_score.out
"""

import numpy as np

from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

EXPECTED = {2: np.float32(3.2668595), 1: np.float32(2.8213787)}


def _top(mock_index, extra_param_zero=None):
    q = ast.Parse("keyboard", field="description")
    if extra_param_zero is not None:
        # the reference's `AND $2 = 0` one-time filter analog: a
        # non-scoring predicate AROUND the scored query (the plan shows
        # One-Time Filter above the scan; it contributes nothing)
        q = ast.HeapFilter(q, f"{extra_param_zero} = 0")
    rows = (compile_query(mock_index, q)
            .orderBy("score", ascending=False).limit(5).collect())
    return {r["doc_id"]: np.float32(r["score"]) for r in rows}


def test_repeated_executions_stable(mock_index):
    """Six executions — the reference's custom→generic plan switch
    boundary — all identical."""
    results = [_top(mock_index) for _ in range(6)]
    assert all(r == EXPECTED for r in results)


def test_with_parameter_clause(mock_index):
    """`AND $2 = 0` with $2=0 keeps rows and scores unchanged."""
    assert _top(mock_index, extra_param_zero=0) == EXPECTED


def test_parameter_clause_false_filters_all(mock_index):
    assert _top(mock_index, extra_param_zero=1) == {}
