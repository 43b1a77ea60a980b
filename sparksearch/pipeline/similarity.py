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
    """Approximate cosine top-k with signatures computed on the fly —
    ad-hoc/one-shot path (full scan).  For repeated queries at scale use
    :class:`AnnIndex`, which persists the banded signatures in a
    partition-pruned layout."""
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


class AnnIndex:
    """Persisted LSH-ANN layout (reference analog: pgvector IVF — an
    inverted list per coarse bucket; here random-hyperplane sign-bit
    bands, which map onto parquet partition pruning).

    Build-time: each vector's n_planes sign bits are split into ``bands``
    band values; the exploded (band, bv → id) table is written
    partitioned by (band, bv), the id→vector table alongside.  Query-time:
    only the ≤ bands partitions matching the query signature are read
    (partition filters in the plan — no full scan), candidates are
    exact-ranked after a semi-join back to the vector table.
    """

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta
        self.planes = meta["planes"]
        self.bands = meta["bands"]
        self.width = meta["n_planes"] // meta["bands"]

    def topk(self, query_vec, k: int = 10) -> DataFrame:
        qsig = _sig_py([float(x) for x in query_vec], self.planes)
        mask = (1 << self.width) - 1
        buckets = self.spark.read.parquet(f"{self.path}/buckets")
        cond = F.lit(False)
        for i in range(self.bands):
            qb = (qsig >> (i * self.width)) & mask
            cond = cond | ((F.col("band") == i) & (F.col("bv") == qb))
        cand_ids = buckets.filter(cond).select("id").distinct()
        vecs = self.spark.read.parquet(f"{self.path}/vectors")
        cands = vecs.join(cand_ids, "id", "left_semi")
        return cosine_topk(cands, "id", "vec", query_vec, k)


def build_ann_index(emb: DataFrame, key: str, vec_col: str, path: str,
                    n_planes: int = 16, bands: int = 4,
                    seed: int = 29) -> AnnIndex:
    """One pass over the embeddings: compute signatures, explode into
    band buckets, write partitioned by (band, bv) so queries prune to
    their matching buckets."""
    import json
    import os
    spark = emb.sparkSession
    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(n_planes, dim, seed)
    v = F.col(vec_col).cast("array<double>")
    sig = _sig_expr(v, planes)
    width = n_planes // bands
    mask = (1 << width) - 1
    chunks = F.array(*[
        F.shiftrightunsigned(sig, i * width).bitwiseAND(F.lit(mask))
        for i in range(bands)])
    base = emb.select(F.col(key).alias("id"), v.alias("vec"),
                      F.posexplode(chunks).alias("band", "bv"))
    (base.select("id", "band", "bv")
     .repartition("band", "bv")
     .write.mode("overwrite").partitionBy("band", "bv")
     .parquet(f"{path}/buckets"))
    (emb.select(F.col(key).alias("id"), v.alias("vec"))
     .write.mode("overwrite").parquet(f"{path}/vectors"))
    meta = {"n_planes": n_planes, "bands": bands, "seed": seed,
            "dim": dim, "planes": planes}
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/ann_meta.json", "w") as fh:
        json.dump(meta, fh)
    return AnnIndex(spark, path, meta)


def load_ann_index(spark, path: str) -> AnnIndex:
    import json
    with open(f"{path}/ann_meta.json") as fh:
        return AnnIndex(spark, path, json.load(fh))


# ---------------------------------------------------------------------------
# IVF (inverted-file) vector index — the reference's clustered vector
# layout (docs/documentation/vector/overview.mdx "vector clusters",
# indexing-vectors centroid_ratio; tuning.mdx vector_cluster_max_probe):
# k-means centroids at build time, every vector stored in its nearest
# centroid's cluster, queries probe only the clusters whose centroids
# are closest to the query (a max_probe fraction), then exact-rank
# inside the probed clusters.  Maps onto Spark as parquet partitioned by
# cluster id → partition pruning does the probe skipping.
# ---------------------------------------------------------------------------

def train_centroids(vecs, k: int, seed: int = 7, iters: int = 8):
    """Deterministic spherical k-means (fixed seed + iteration count,
    float64) — both the Spark build and the DuckDB oracle twin call this
    on identically-ordered input, so centroids are bit-identical."""
    import numpy as np
    v = np.asarray(vecs, dtype=np.float64)
    rng = np.random.RandomState(seed)
    c = v[rng.choice(len(v), size=k, replace=False)].copy()
    vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(vn @ cn.T, axis=1)
        for j in range(k):
            members = v[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in c]


def _cluster_expr(vec: Column, centroids: list) -> Column:
    """1-based nearest-centroid id (cosine): argmax of dot(v, ĉ_j) with
    first-max tie-break — array_position(dots, array_max(dots)),
    identical to DuckDB's list_indexof(l, list_max(l)) twin."""
    import math
    dots = F.array(*[
        F.aggregate(F.zip_with(vec, _vec_lit(c), lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x)
        / F.lit(math.sqrt(sum(x * x for x in c)) or 1.0)
        for c in centroids])
    return F.array_position(dots, F.array_max(dots))


class IvfIndex:
    """Persisted IVF layout: vectors parquet-partitioned by cluster id;
    ``topk`` probes the nearest ``nprobe`` clusters (or a ``max_probe``
    fraction, the reference's vector_cluster_max_probe semantics) via
    partition filters, then exact cosine-ranks the probed vectors."""

    def __init__(self, spark, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta
        self.centroids = meta["centroids"]

    def probe_clusters(self, query_vec, nprobe: int) -> list:
        import math
        qn = math.sqrt(sum(float(x) ** 2 for x in query_vec)) or 1.0
        scored = []
        for j, c in enumerate(self.centroids):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            dot = sum(float(a) * b for a, b in zip(query_vec, c))
            scored.append((dot / (qn * cn), -(j + 1)))
        scored.sort(reverse=True)
        return [-neg for _, neg in scored[:nprobe]]

    def topk(self, query_vec, k: int = 10, nprobe: int | None = None,
             max_probe: float | None = None) -> DataFrame:
        n = len(self.centroids)
        if nprobe is None:
            frac = max_probe if max_probe is not None else 0.25
            nprobe = max(1, int(n * frac))
        probe = self.probe_clusters(query_vec, nprobe)
        vecs = self.spark.read.parquet(f"{self.path}/clusters")
        cands = vecs.filter(F.col("cluster").isin(probe))
        return cosine_topk(cands, "id", "vec", query_vec, k)


def build_ivf_index(emb: DataFrame, key: str, vec_col: str, path: str,
                    n_clusters: int = 16, seed: int = 7,
                    train_limit: int = 4096) -> IvfIndex:
    """Train centroids on the first ``train_limit`` vectors in key order
    (deterministic sample), assign every vector to its nearest centroid
    with a codegen'd argmax expression, write partitioned by cluster."""
    import json
    import os
    spark = emb.sparkSession
    sample = (emb.orderBy(key).limit(train_limit)
              .select(F.col(vec_col).cast("array<double>")).collect())
    centroids = train_centroids([r[0] for r in sample], n_clusters, seed)
    v = F.col(vec_col).cast("array<double>")
    assigned = emb.select(F.col(key).alias("id"), v.alias("vec")) \
                  .withColumn("cluster", _cluster_expr(F.col("vec"),
                                                       centroids))
    (assigned.repartition("cluster")
     .write.mode("overwrite").partitionBy("cluster")
     .parquet(f"{path}/clusters"))
    meta = {"n_clusters": n_clusters, "seed": seed,
            "train_limit": train_limit, "centroids": centroids}
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/ivf_meta.json", "w") as fh:
        json.dump(meta, fh)
    return IvfIndex(spark, path, meta)


def load_ivf_index(spark, path: str) -> IvfIndex:
    import json
    with open(f"{path}/ivf_meta.json") as fh:
        return IvfIndex(spark, path, json.load(fh))
