"""Sustained micro-batch throughput through the REAL Structured
Streaming path (StreamingIndexer + foreachBatch exactly-once sink),
complementing bench.py's batch-build north metric: the same transcript
corpus is drained with availableNow + maxFilesPerTrigger so it flows
through N micro-batches — watermark, dropDuplicatesWithinWatermark
state, epoch-keyed segment commits, lineage records and all — and the
wall-clock drain time gives streaming turns/sec.

Usage: python tools/streaming_throughput.py [--convs 20000]
       [--n-files 64] [--files-per-trigger 8] [--cores 8] [--mode turn]

Prints one JSON line:
{"streaming_turns_per_sec": ..., "steady_turns_per_sec": ...,
 "turns": ..., "wall_s": ..., "micro_batches": ...,
 "batches": [{"epoch": ..., "rows": ..., "batch_s": ...}, ...]}
(steady_turns_per_sec = rows/addBatch-time over batches after the
first — the sustained rate once per-drain constants are amortized)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = os.environ.get("SPARKSEARCH_STREAM_BENCH_TMP",
                      "/dev/shm/sparksearch_stream_bench")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20000)
    ap.add_argument("--n-files", type=int, default=64)
    ap.add_argument("--files-per-trigger", type=int, default=8)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--mode", default="turn",
                    choices=["turn", "conversation"])
    ap.add_argument("--runs", type=int, default=2,
                    help="timed drains; best (max t/s) reported")
    ap.add_argument("--no-prune", action="store_true",
                    help="disable dead-column pruning before the dedup "
                         "exchange (A/B baseline)")
    ap.add_argument("--local-cluster", action="store_true",
                    help="separate 2-core executor JVMs (cores/2 executors)"
                         " — the literal N-executors vs 4N-executors form")
    args = ap.parse_args()

    if args.local_cluster:
        from pyspark.sql import SparkSession
        n_exec = max(args.cores // 2, 1)
        spark = (SparkSession.builder
                 .master(f"local-cluster[{n_exec},2,4096]")
                 .appName(f"stream-throughput-lc-{n_exec}")
                 .config("spark.executor.memory", "4g")
                 .config("spark.driver.memory", "6g")
                 .config("spark.sql.shuffle.partitions", str(n_exec * 2))
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.ui.enabled", "false")
                 .config("spark.local.dir", "/dev/shm/sparksearch-local")
                 .config("spark.executor.extraJavaOptions",
                         "-XX:+UseParallelGC -XX:ParallelGCThreads=2")
                 # executor Python workers need the repo importable for
                 # the mapInPandas corpus generator (local mode inherits
                 # the driver's sys.path; separate JVMs do not)
                 .config("spark.executorEnv.PYTHONPATH",
                         os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
                 .getOrCreate())
    else:
        from sparksearch.session import get_spark
        spark = get_spark(app_name="stream-throughput", cores=args.cores,
                          shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    from sparksearch.fixtures import TRANSCRIPTS_SCHEMA, transcripts_distributed
    from sparksearch.schema import IndexSchema, FieldConfig
    from sparksearch.streaming import StreamingIndexer

    # range-partition by event time so micro-batches consume the stream in
    # arrival order (a randomly-partitioned split would feed whole batches
    # of data older than the advanced watermark, which the stateful dedup
    # correctly drops — that's the late-data path, not a throughput run)
    src = f"{WORK}/transcripts_{args.convs}_p{args.n_files}_ts"
    if not os.path.exists(f"{src}/_SUCCESS"):
        (transcripts_distributed(spark, n_convs=args.convs, seed=7)
         .repartitionByRange(args.n_files, "ts")
         .write.mode("overwrite").parquet(src))
    df = spark.read.parquet(src)
    n_turns = df.count()
    n_keys = df.select("conv_id", "turn_idx").distinct().count()

    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    best = None
    for run in range(args.runs):
        index_path = f"{WORK}/index_r{run}"
        ckpt = f"{WORK}/ckpt_r{run}"
        shutil.rmtree(index_path, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        ix = StreamingIndexer(schema, index_path, ckpt, mode=args.mode,
                              prune_dedup_columns=not args.no_prune)
        stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
                  .option("maxFilesPerTrigger", args.files_per_trigger)
                  .parquet(src))
        t0 = time.time()
        q = ix.start(stream, trigger={"availableNow": True})
        q.awaitTermination()
        wall = time.time() - t0
        progress = [json.loads(p) if isinstance(p, str) else p
                    for p in q.recentProgress]
        batches = [{"epoch": p["batchId"],
                    "rows": p["numInputRows"],
                    "batch_s": round(p["batchDuration"] / 1000.0, 2)}
                   for p in progress if p.get("numInputRows")]
        # exactly-once sanity: every distinct natural key landed in
        # exactly one epoch (range-split by ts keeps event time monotone
        # across batches, so nothing is watermark-late; duplicates are
        # deduped by design)
        with open(f"{index_path}/_lineage.jsonl") as fh:
            indexed = sum(json.loads(line)["docs"] for line in fh)
        assert indexed == n_keys, (indexed, n_keys, n_turns)
        # steady-state rate: rows/addBatch-time over all batches after the
        # first — excludes the per-drain constants (query planning/start,
        # first-batch codegen warmup, final availableNow trigger, stop)
        # that amortize to zero over a real run's lifetime but dominate a
        # short drain's wall clock
        steady = ([b for b in batches[1:]] or batches)
        steady_tps = round(sum(b["rows"] for b in steady)
                           / max(sum(b["batch_s"] for b in steady), 1e-9), 1)
        rec = {"streaming_turns_per_sec": round(n_turns / wall, 1),
               "steady_turns_per_sec": steady_tps,
               "turns": n_turns, "wall_s": round(wall, 1),
               "micro_batches": len(batches), "run": run,
               "mode": args.mode, "cores": args.cores,
               "files_per_trigger": args.files_per_trigger,
               "batches": batches}
        if best is None or rec["streaming_turns_per_sec"] > \
                best["streaming_turns_per_sec"]:
            best = rec
    print(json.dumps(best))


if __name__ == "__main__":
    main()
