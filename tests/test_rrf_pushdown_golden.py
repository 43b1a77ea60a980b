"""rrf_pushdown.out parity — rank windows over truncated top-N.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
rrf_pushdown.out (issue #5742).  A bare ranking window whose ordering
matches the query's ORDER BY + LIMIT may be fed only the top N rows —
the golden asserts ``mismatches = 0`` between the truncated and
full-corpus computations for ROW_NUMBER/RANK/DENSE_RANK, the OFFSET
case (scan must fetch LIMIT+OFFSET), and keeps the non-pushable shapes
(PARTITION BY, mismatched ordering, DISTINCT, GROUP BY) correct.  The
engine's analog of the truncation is ``rrf_fuse``'s per-list depth cut
(hybrid.py) and Spark's TakeOrderedAndProject; these tests pin the
result-preserving property on the golden's corpus.

Corpus: 500 rows, label 'shoes item g', n = g, grp = g % 4.
"""

import pytest
from pyspark.sql import functions as F, Window as W

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.hybrid import rrf_fuse
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def wlp(spark):
    df = spark.range(1, 501).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("shoes item "), F.col("id")).alias("label"),
        F.col("id").cast("int").alias("n"),
        (F.col("id") % 4).cast("int").alias("grp"))
    idx = build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="label")]))
    # matched docs with their attributes (all 500 match 'shoes')
    m = compile_query(idx, ast.Parse("shoes", field="label")) \
        .join(df, F.col("doc_id") == df["id"]).select("id", "n", "grp",
                                                      "score")
    return m.cache()


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("fn", [F.row_number, F.rank, F.dense_rank])
def test_truncated_rank_equals_full(wlp, fn):
    # golden: window ordering == query ordering → top-N truncation is
    # result-preserving for all three ranking functions
    win = W.orderBy(F.col("n").desc(), F.col("id"))
    full = (wlp.select("id", fn().over(win).alias("rank"))
            .orderBy("rank").limit(25))
    # truncated: rank over only the top 25 rows in the same order
    top = wlp.orderBy(F.col("n").desc(), F.col("id")).limit(25)
    trunc = (top.select("id", fn().over(win).alias("rank"))
             .orderBy("rank"))
    assert _rows(full) == _rows(trunc)


def test_offset_needs_limit_plus_offset_rows(wlp):
    # golden OFFSET section: ranks past the offset must come from a
    # LIMIT+OFFSET fetch, not a LIMIT fetch
    win = W.orderBy(F.col("n").desc())
    full = (wlp.select("id", F.row_number().over(win).alias("rank"))
            .orderBy("rank").offset(30).limit(20))
    top = wlp.orderBy(F.col("n").desc()).limit(50)  # LIMIT + OFFSET
    trunc = (top.select("id", F.row_number().over(win).alias("rank"))
             .orderBy("rank").offset(30).limit(20))
    assert _rows(full) == _rows(trunc)
    assert len(_rows(trunc)) == 20


def test_partition_by_draws_outside_top_n(wlp):
    # non-pushable: PARTITION BY ranks need rows beyond the top 10 —
    # pinning that the full computation differs from a naive truncation
    win = W.partitionBy("grp").orderBy(F.col("n").desc())
    full = (wlp.select("id", "n", F.row_number().over(win).alias("rank"))
            .orderBy(F.col("n").desc(), F.col("id")).limit(10))
    got = {(r["id"], r["rank"]) for r in full.collect()}
    # ids 491..500, per-grp row_numbers: 500→1, 499→1, 498→1, 497→1,
    # 496→2, ... (four partitions interleave)
    want = {(500 - i, i // 4 + 1) for i in range(10)}
    assert got == want


def test_distinct_dense_rank(wlp):
    # golden DISTINCT section: 4 distinct grp values, LIMIT 3 → 3 rows
    win = W.orderBy(F.col("grp").desc())
    got = (wlp.select("grp", F.dense_rank().over(win).alias("rank"))
           .distinct().orderBy(F.col("grp").desc()).limit(3))
    assert _rows(got) == [(3, 1), (2, 2), (1, 3)]


def test_rrf_two_branch_truncation_preserves_result(wlp):
    # the RRF shape: branch a = text score rank, branch b = n desc rank,
    # both truncated to 20; equals the full-corpus RRF top 5
    a = wlp.select("id", "score")
    b = wlp.select("id", F.col("n").cast("double").alias("score"))
    got = _rows(rrf_fuse([a, b], key="id", k=60, depth=20)
                .limit(5).select("id"))
    # full twin: ranks over the whole 500-row set, same fusion formula
    wa = W.orderBy(F.col("score").desc(), F.col("id"))
    fa = wlp.select("id", F.rank().over(wa).alias("ra"))
    wb = W.orderBy(F.col("n").desc(), F.col("id"))
    fb = wlp.select("id", F.rank().over(wb).alias("rb"))
    full = (fa.join(fb, "id", "full")
            .select("id", (F.coalesce(1.0 / (60 + F.col("ra")), F.lit(0.0))
                           + F.coalesce(1.0 / (60 + F.col("rb")),
                                        F.lit(0.0))).alias("rrf"))
            .orderBy(F.col("rrf").desc(), F.col("id")).limit(5)
            .select("id"))
    # truncation is result-preserving because every fused doc in the
    # top 5 comes from the top-20 of at least one branch
    assert set(r[0] for r in got) == set(r[0] for r in _rows(full))
