"""Deprecated weighted RRF hybrid — rust-suite parity (PUBLIC reference
behavior, mock_items corpus + the synthesized pgvector embeddings from
tests/tests/hybrid.rs:24-77): the docs' pre-RRF recipe fuses a semantic
leg (RANK() over ``embedding <=> '[1,2,3,0,0,0,0,0]'`` ASC, top 20) with
a BM25 leg (RANK() over score DESC) as 0.1/(60+sem_rank) +
0.9/(60+bm25_rank), FULL OUTER JOIN on id.  Embeddings repeat mod 10
(``[(id+1)%10+1, (id+2)%10+1, (id+3)%10+1, 0..]``), so the semantic leg
is FULL of exact distance ties — RANK() must give tied docs the SAME
rank (PG RANK semantics, not dense/row-number), or the fused order
diverges from the pinned top-5 [2, 1, 19, 9, 29].

Ref: tests/tests/hybrid.rs:24-77 (hybrid_deprecated)
"""

import pytest
from pyspark.sql import Window as W, functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

QV = [1.0, 2.0, 3.0]  # non-zero prefix of '[1,2,3,0,0,0,0,0]'


def test_hybrid_deprecated_weighted_rrf(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category")]))
    # synthesized embedding: only the first 3 components are non-zero
    e1 = (F.col("id") + 1) % 10 + 1
    e2 = (F.col("id") + 2) % 10 + 1
    e3 = (F.col("id") + 3) % 10 + 1
    dot = e1 * QV[0] + e2 * QV[1] + e3 * QV[2]
    qn = sum(x * x for x in QV) ** 0.5
    dist = 1 - dot / (F.sqrt(e1 * e1 + e2 * e2 + e3 * e3) * F.lit(qn))
    sem = (docs.select("id", dist.alias("dist"))
           .orderBy(F.col("dist").asc(), F.col("id").asc()).limit(20)
           .select("id", F.rank().over(W.orderBy(F.col("dist").asc()))
                   .alias("sem_rank")))
    bm = (compile_query(idx, ast.Parse("keyboard", field="description"))
          .select(F.col("doc_id").alias("id"),
                  F.rank().over(W.orderBy(F.col("score").desc()))
                  .alias("bm_rank")))
    fused = (sem.join(bm, "id", "full_outer")
             .withColumn("score",
                         F.coalesce(1.0 / (60 + F.col("sem_rank")),
                                    F.lit(0.0)) * 0.1
                         + F.coalesce(1.0 / (60 + F.col("bm_rank")),
                                      F.lit(0.0)) * 0.9)
             .orderBy(F.col("score").desc(), F.col("id").asc())
             .limit(5).collect())
    got = [r["id"] for r in fused]
    # the reference pins [2, 1, 19, 9, 29] — but positions 3..5 are an
    # EXACT four-way fused-score tie (ids 9/19/29/39 all share the
    # zero-distance embedding [1,2,3,...] and no BM25 match), so the
    # reference order among them is Postgres's arbitrary physical order.
    # Assert the deterministic semantics: BM25 winners first (2 over 1),
    # then any three of the tied zero-distance ids with equal scores.
    assert got[:2] == [2, 1]
    assert set(got[2:]) < {9, 19, 29, 39}
    tied = {round(r["score"], 12) for r in fused[2:]}
    assert len(tied) == 1
    # and the two BM25-backed scores are strictly above the tied tail
    assert fused[0]["score"] > fused[1]["score"] > fused[2]["score"]
