"""Vector-index job — build / query / insert an ANN layout from
spark-submit.

    spark-submit --py-files /tmp/sparksearch.zip jobs/vector_index_job.py \\
        build --source /data/embeddings.parquet --key vec_id \\
        --vec embedding --index /data/pq_index --kind pq \\
        [--m 8 --k 16 --coarse 64 --metric l2]

    spark-submit ... jobs/vector_index_job.py query \\
        --index /data/pq_index --kind pq --query-id 0 \\
        --source /data/embeddings.parquet --key vec_id --vec embedding \\
        --limit 10 [--rerank 5]

    spark-submit ... jobs/vector_index_job.py insert \\
        --index /data/pq_index --kind ivf --source /data/new.parquet \\
        --key vec_id --vec embedding [--epoch 42]

Kinds: ``pq`` (product quantization, optional IVF-PQ via --coarse),
``ivf`` (cluster-partitioned full precision), ``lsh`` (banded
signatures, build/query only).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["build", "query", "insert"])
    ap.add_argument("--index", required=True)
    ap.add_argument("--kind", choices=["pq", "ivf", "lsh"], default="pq")
    ap.add_argument("--source")
    ap.add_argument("--key", default="vec_id")
    ap.add_argument("--vec", default="embedding")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--coarse", type=int, default=0)
    ap.add_argument("--clusters", type=int, default=16)
    ap.add_argument("--metric", default="l2")
    ap.add_argument("--query-id", type=int, default=0)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--rerank", type=int, default=0)
    ap.add_argument("--nprobe", type=int, default=0)
    ap.add_argument("--epoch", type=int, default=None)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName(f"sparksearch-vector-{args.action}")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from pyspark.sql import functions as F
    from sparksearch.pipeline.similarity import (
        build_pq_index, load_pq_index, build_ivf_index, load_ivf_index,
        build_ann_index, load_ann_index)

    if args.action == "build":
        emb = spark.read.parquet(args.source)
        if args.kind == "pq":
            idx = build_pq_index(emb, args.key, args.vec, args.index,
                                 m=args.m, k_codes=args.k,
                                 coarse_clusters=args.coarse,
                                 metric=args.metric)
            print(idx.vector_info())
        elif args.kind == "ivf":
            idx = build_ivf_index(emb, args.key, args.vec, args.index,
                                  n_clusters=args.clusters)
            print(idx.vector_info())
        else:
            build_ann_index(emb, args.key, args.vec, args.index)
            print({"vector_format": "lsh"})
        return

    if args.action == "insert":
        if args.kind == "lsh":
            raise SystemExit("lsh layout is rebuild-only")
        idx = (load_pq_index(spark, args.index) if args.kind == "pq"
               else load_ivf_index(spark, args.index))
        idx.insert(spark.read.parquet(args.source), args.key, args.vec,
                   epoch_id=args.epoch)
        print(idx.vector_info())
        return

    emb = spark.read.parquet(args.source)
    qv = [float(x) for x in emb.filter(
        F.col(args.key) == args.query_id).select(args.vec).first()[0]]
    if args.kind == "pq":
        idx = load_pq_index(spark, args.index)
        res = idx.topk(qv, k=args.limit, rerank=args.rerank,
                       nprobe=args.nprobe or None)
    elif args.kind == "ivf":
        idx = load_ivf_index(spark, args.index)
        res = idx.topk(qv, k=args.limit,
                       nprobe=args.nprobe or None)
    else:
        idx = load_ann_index(spark, args.index)
        res = idx.topk(qv, k=args.limit)
    for r in res.collect():
        print(f"{r['id']}\t{r['dist']:.6f}")


if __name__ == "__main__":
    main()
