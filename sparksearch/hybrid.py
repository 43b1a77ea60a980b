"""Hybrid retrieval: Reciprocal Rank Fusion of BM25 and vector rankings.

Reference: docs/documentation/hybrid/rrf.mdx — ParadeDB computes RRF in
plain SQL with RANK() windows over a BM25 CTE and a vector-distance CTE;
here the same shape over our search compiler + cosine ranking:

    rrf(doc) = Σ_r 1 / (k + rank_r(doc)),  k = 60 by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def rrf_fuse(rankings: list, key: str = "doc_id", k: int = 60,
             weights: list | None = None, depth: int | None = None) -> DataFrame:
    """Fuse ranked DataFrames (each with columns (key, score)) by RRF.

    Each input is truncated to its top-``depth`` rows first (standard RRF
    fuses top-N lists) via TakeOrderedAndProject — fully distributed —
    so the rank window only ever sees ≤ depth rows instead of pulling the
    whole match set through one partition.  Each list is ranked by its
    own score descending (ties broken by key for determinism); missing
    docs contribute nothing — standard RRF outer-union semantics.
    """
    if depth is None:
        from sparksearch.config import CONFIG
        depth = CONFIG.rrf_depth
    weights = weights or [1.0] * len(rankings)
    parts = []
    for i, (df, w) in enumerate(zip(rankings, weights)):
        top = df.orderBy(F.col("score").desc(), F.col(key).asc()).limit(depth)
        win = W.orderBy(F.col("score").desc(), F.col(key).asc())
        parts.append(top.select(key, F.rank().over(win).alias("r"))
                     .select(key, (F.lit(float(w)) / (F.lit(k) + F.col("r")))
                             .alias("rrf")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy(key).agg(F.sum("rrf").alias("rrf_score"))
            .orderBy(F.col("rrf_score").desc(), F.col(key).asc()))


def hybrid_search(index, query, emb_df: DataFrame, emb_key: str,
                  vec_col: str, query_vec, limit: int = 10,
                  k: int = 60) -> DataFrame:
    """BM25 ∪ cosine RRF hybrid top-k: (doc_id, rrf_score)."""
    from sparksearch.query.compiler import compile_query
    from sparksearch.query.search import _as_query
    from sparksearch.pipeline.similarity import cosine_topk
    bm25 = compile_query(index, _as_query(index, query))
    cos = (cosine_topk(emb_df, emb_key, vec_col, query_vec, k=limit * 10)
           .select(F.col("id").alias("doc_id"), F.col("cos").alias("score")))
    return rrf_fuse([bm25, cos], key="doc_id", k=k).limit(limit)
