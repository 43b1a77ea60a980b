import math

import pytest

from sparksearch.scoring import (FIELD_NORMS_TABLE, bm25_py, idf,
                                 quantize_len, quantize_len_expr)


def test_fieldnorm_table_shape():
    # Lucene SmallFloat byte4: exact through 40, then 42,44,... (truncating)
    assert FIELD_NORMS_TABLE[:41] == list(range(41))
    assert FIELD_NORMS_TABLE[41:48] == [42, 44, 46, 48, 50, 52, 54]
    assert len(FIELD_NORMS_TABLE) == 256
    assert FIELD_NORMS_TABLE == sorted(FIELD_NORMS_TABLE)


@pytest.mark.parametrize("n", [0, 1, 5, 40, 41, 42, 55, 56, 63, 64, 100, 1000, 10**6])
def test_quantize_matches_table(n):
    # quantize = largest table value <= n
    import bisect
    expect = FIELD_NORMS_TABLE[
        bisect.bisect_right(FIELD_NORMS_TABLE, min(n, FIELD_NORMS_TABLE[-1])) - 1]
    assert quantize_len(n) == expect


def test_quantize_expr_agrees_with_python(spark):
    import pyspark.sql.functions as F
    vals = [0, 1, 3, 40, 41, 42, 55, 56, 57, 100, 1000, 65_000, 10**6]
    df = spark.createDataFrame([(v,) for v in vals], "n int")
    got = {r["n"]: r["q"] for r in
           df.withColumn("q", quantize_len_expr(F.col("n"))).collect()}
    for v in vals:
        assert got[v] == quantize_len(v), v


def test_golden_bm25_values():
    # reference pg_regress expected/topk_scores.out:30-37 (float32 display)
    N, avg = 41, 3.0
    assert bm25_py(1, 3, N, 2, avg) == pytest.approx(2.8213787, abs=2e-6)
    assert bm25_py(1, 2, N, 2, avg) == pytest.approx(3.2668595, abs=2e-6)
    assert bm25_py(1, 3, N, 3, avg) + 1.0 == pytest.approx(3.4849067, abs=2e-6)
    assert bm25_py(1, 2, N, 3, avg) + 1.0 == pytest.approx(3.8772602, abs=2e-6)


def test_idf_formula():
    assert idf(41, 3) == pytest.approx(math.log(12.0))


def test_score_aggregation_golden(spark):
    """min/max/avg over pdb.score (pg_regress agg-score.out: 8 identical
    'keyboard' docs -> every score = ln(1 + 0.5/8.5) = 0.057158466)."""
    from pyspark.sql import functions as F
    from sparksearch.index import build_index
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    from sparksearch.schema import IndexSchema, FieldConfig
    docs = spark.createDataFrame([(i, "keyboard") for i in range(1, 9)],
                                 "id int, description string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    d = compile_query(idx, ast.Parse("keyboard", field="description"))
    row = d.agg(F.min("score").alias("mn"), F.max("score").alias("mx"),
                F.avg("score").alias("av"), F.count("*").alias("n")).collect()[0]
    assert row["n"] == 8
    # the reference reports Tantivy's scores computed IN f32 arithmetic
    # (intermediates rounded at every step); ours are f64 end-to-end —
    # values agree to f32 machine epsilon (~1e-7 relative), which is the
    # honest comparison bound
    assert row["mn"] == pytest.approx(0.057158466, rel=2e-6)
    assert row["mx"] == pytest.approx(0.057158466, rel=2e-6)
    assert row["av"] == pytest.approx(0.057158466428518295, rel=2e-6)
    assert row["mn"] == row["mx"]
    # count with a score condition (ScoreFilter in WHERE)
    assert d.filter(F.col("score") > 0).count() == 8
