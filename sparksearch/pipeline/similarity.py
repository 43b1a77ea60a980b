"""Similarity search over embedding columns.

- :func:`cosine_topk` — brute-force exact cosine top-k (the baseline and
  the verifier).
- :func:`lsh_cosine_topk` — random-hyperplane LSH-bucketed approximate
  top-k: only buckets matching the query's signature bands are scanned,
  the scale path (prunes the scan to a small fraction of 10^9 vectors).

Reference analog: pg_search stores pgvector columns (schema/mod.rs Vector
type, vector/metric.rs cosine/L2/IP) and orders by distance operators
(orderby.rs VectorDistance); the IVF/HNSW index is replaced here by LSH
bucketing, which maps onto Spark partition pruning.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, functions as F


def _cos(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def _vec_lit(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list:
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def _sig_expr(vec: Column, planes: list) -> Column:
    """Pack sign(v·plane_i) bits into a long."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(F.zip_with(vec, _vec_lit(p), lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        out = out + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return out


def _sig_py(v, planes) -> int:
    out = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(v, p)) >= 0:
            out |= 1 << i
    return out


def cosine_topk(emb: DataFrame, key: str, vec_col: str, query_vec,
                k: int = 10) -> DataFrame:
    """Exact cosine top-k: (key, cos), descending."""
    v = F.col(vec_col).cast("array<double>")
    qn = math.sqrt(sum(float(x) ** 2 for x in query_vec))
    dot = F.aggregate(F.zip_with(v, _vec_lit(query_vec), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    cos = dot / (na * F.lit(qn))
    return (emb.select(F.col(key).alias("id"), cos.alias("cos"))
            .orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k))


def lsh_cosine_topk(emb: DataFrame, key: str, vec_col: str, query_vec,
                    k: int = 10, n_planes: int = 16, bands: int = 4,
                    seed: int = 29) -> DataFrame:
    """Approximate cosine top-k: scan only vectors sharing ≥1 signature
    band with the query (partition-prunable at scale), exact-rank the
    candidates.  Recall rises with bands/planes; verify against
    :func:`cosine_topk` on a sample."""
    dim = len(query_vec)
    planes = _hyperplanes(n_planes, dim, seed)
    v = F.col(vec_col).cast("array<double>")
    sig = _sig_expr(v, planes)
    qsig = _sig_py([float(x) for x in query_vec], planes)
    width = n_planes // bands
    mask = (1 << width) - 1
    band_match = F.lit(False)
    for i in range(bands):
        qb = (qsig >> (i * width)) & mask
        band_match = band_match | (
            F.shiftrightunsigned(sig, i * width).bitwiseAND(F.lit(mask))
            == F.lit(qb))
    cands = emb.filter(band_match)
    return cosine_topk(cands, key, vec_col, query_vec, k)
