"""score_select_subquery.out golden (PUBLIC reference behavior, table
replicated inline — issue #4596): score and snippet projections work
when the WHERE clause carries an uncorrelated scalar subquery gate —
(SELECT true) keeps all hits with scores intact (0.6931472 = f32 ln 2
for 'dog', df=2 of N=4), (SELECT false) yields nothing.

Ref: pg_search/tests/pg_regress/expected/score_select_subquery.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippet
from sparksearch.query import ast, search


@pytest.fixture(scope="module")
def animals_index(spark):
    docs = spark.createDataFrame(
        [(1, "description 1 dog"), (2, "description 2 cat"),
         (3, "description 3 dog"), (4, "description 4 parrot")],
        "id long, description string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))


Q = ast.Match("description", "dog")  # description ||| 'dog'


def _gated(idx, gate: bool):
    hits = search(idx, Q, order_by=[("score", "desc"), ("id", "asc")],
                  columns=["id", "description"])
    # the scalar-subquery gate is an uncorrelated boolean initplan —
    # Spark folds it to a literal filter
    return hits.filter(F.lit(gate))


def test_select_true_keeps_scores(animals_index):
    rows = _gated(animals_index, True).limit(1).collect()
    assert [(r["id"], np.float32(r["score"])) for r in rows] == \
        [(1, np.float32("0.6931472"))]


def test_select_true_snippet(animals_index):
    hits = _gated(animals_index, True).orderBy("id").limit(1)
    out = with_snippet(animals_index, hits, Q, "description")
    rows = out.select("id", "snippet").collect()
    assert [(r[0], r[1]) for r in rows] == \
        [(1, "description 1 <b>dog</b>")]


def test_select_false_returns_nothing(animals_index):
    assert _gated(animals_index, False).count() == 0
