"""agg-score.out golden (PUBLIC reference behavior): SQL aggregates over
pdb.score(id) — min/max/avg/sum of the BM25 score and COUNT(*) gated on
score > 0.  The golden builds its OWN table of exactly 8 rows, each
description='keyboard' (not the 41-row mock_items corpus), so N=df=8,
every doc length equals avgdl, every score is the same f32
idf = ln(1 + 0.5/8.5) = 0.057158466 and the sum is its 8-fold f32
accumulation 0.45726773.

Ref: pg_search/tests/pg_regress/expected/agg-score.out
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

S = 0.057158466


@pytest.fixture(scope="module")
def scores(spark):
    docs = spark.createDataFrame(
        [(i, "keyboard") for i in range(1, 9)], "id int, description string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    return compile_query(idx, ast.Parse("keyboard", field="description"))


def test_min_max_avg_of_score(scores):
    r = scores.agg(F.min("score").alias("mn"),
                   F.max("score").alias("mx"),
                   F.avg("score").alias("av")).collect()[0]
    assert np.float32(r["mn"]) == np.float32(S)
    assert np.float32(r["mx"]) == np.float32(S)
    assert r["av"] == pytest.approx(0.057158466428518295, abs=1e-12)


def test_count_score_positive(scores):
    assert scores.filter(F.col("score") > 0).count() == 8


def test_sum_of_scores(scores):
    r = scores.agg(F.sum("score").alias("s")).collect()[0]
    assert np.float32(r["s"]) == np.float32(0.45726773)
