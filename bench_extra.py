"""Extra per-query measurement harness for the optimization rounds.

NOT the driver bench (bench.py is frozen): this isolates individual
headline queries per the optimization guide §1 — warmed, min-of-rounds
timing of the same ``.collect()`` the driver times, plus
``.explain("formatted")`` capture for plans/r06/.

Usage:
  python bench_extra.py --queries bm25_topk,minhash_pairs --tag before
  python bench_extra.py              # all headline queries, timing only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = ["bm25_topk", "maxscore_disjunction", "term_count",
            "conjunction", "phrase",
            "disjunction_msm", "tpch_q1", "join_topk", "join_aggregate",
            "date_histogram", "window_topn_per_group", "dedup_exact",
            "ngram_jaccard_pairs", "minhash_pairs", "ann_cosine_topk",
            "sessionize_events", "quality_score", "permissioned_topk",
            "multi_index_scored_join", "paging_keyset",
            "tumbling_tf_windows", "enrich_tool_context"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None,
                    help="comma-separated names (default: all headline)")
    ap.add_argument("--plans-dir", default=None,
                    help="write explain('formatted') per query here")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    os.environ.setdefault("SPARKSEARCH_DRIVER_JAVA_OPTS",
                          "-XX:+UseParallelGC -Xmn8g")
    os.environ.setdefault("SPARKSEARCH_DRIVER_MEM", "28g")
    from sparksearch.session import get_spark
    from sparksearch import contract
    spark = get_spark(app_name="bench-extra", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    names = (args.queries.split(",") if args.queries else HEADLINE)
    sf_dir = args.sf
    contract.get_documents_index(spark, sf_dir).postings.count()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = contract.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(f"{args.plans_dir}/{name}_{args.tag}.txt", "w") as fh:
                fh.write(plan)

    for _ in range(args.warmups):
        for name in names:
            contract.QUERIES[name](spark, sf_dir).collect()
    best = {name: float("inf") for name in names}
    for _ in range(args.rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            contract.QUERIES[name](spark, sf_dir).collect()
            best[name] = min(best[name], time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": sf_dir, "tag": args.tag,
                      "queries": {n: round(v, 3) for n, v in best.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
