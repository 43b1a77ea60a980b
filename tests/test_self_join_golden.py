"""self-join.out parity — SJE-combined scores on a self-joined scan.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
self-join.out (PG18 self-join-elimination behavior, which the reference
pins as canonical): a self join on the key with two search predicates
collapses into ONE scan running the combined Boolean query, and every
score() call returns the combined score.  The engine always compiles to
that single-scan shape, so its scores must equal the golden's pinned
float32 values:

corpus: (1,'teddy bear') (2,'brown bear') (3,'polar bear') (4,'teddy')
(5,'bear toy')

- a @@@ 'bear' AND b @@@ 'teddy bear' → rows {1,2,3,5}; doc 1 scores
  1.3877531, docs 2/3/5 score 0.55034834;
- a @@@ 'bear' OR b @@@ 'teddy bear' ORDER BY id LIMIT 1 → row 1 with
  the same 1.3877531.
"""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def bears(spark):
    df = spark.createDataFrame(
        [(1, "teddy bear"), (2, "brown bear"), (3, "polar bear"),
         (4, "teddy"), (5, "bear toy")], "id int, description string")
    return build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))


def _scores(idx, q):
    return {r["doc_id"]: r["score"] for r in compile_query(idx, q).collect()}


def test_and_self_join_combined_scores(bears):
    q = ast.Boolean(must=[ast.Parse("bear", field="description"),
                          ast.Parse("teddy bear", field="description")])
    got = _scores(bears, q)
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == pytest.approx(1.3877531, abs=2e-6)
    for d in (2, 3, 5):
        assert got[d] == pytest.approx(0.55034834, abs=2e-6)


def test_or_self_join_combined_scores(bears):
    q = ast.Boolean(should=[ast.Parse("bear", field="description"),
                            ast.Parse("teddy bear", field="description")])
    got = _scores(bears, q)
    # OR adds doc 4 ('teddy' matches only the second branch)
    assert set(got) == {1, 2, 3, 4, 5}
    first = min(got)  # ORDER BY id LIMIT 1
    assert first == 1
    assert got[1] == pytest.approx(1.3877531, abs=2e-6)
