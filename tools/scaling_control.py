"""DRAM-knee control job — the evidence behind BASELINE.md's claim that
per-core throughput collapse beyond ~16 threads is the BOX, not the engine.

Runs a trivially-parallel NO-ENGINE-CODE workload over the same transcript
corpus bench.py indexes: lower + regex-split + explode + xxhash64 + bit_xor
aggregate — all Spark built-ins, whole-stage codegen, no sparksearch
imports on the hot path, no index write, no meaningful shuffle (only the
single-row partial-agg combine).  If THIS job's per-core throughput shows
the same knee as the index build, the knee is machine memory bandwidth;
any engine-side serialization (locks, driver loops, shuffle skew) would
show up here as a DIFFERENT curve.

Methodology matches bench.py's scaling measurement: one worker subprocess
per parallelism level (own JVM, -XX:ParallelGCThreads=cores — the
persistent pyspark gateway JVM would otherwise share ~23 machine-wide GC
threads across every level), interleaved rounds so bursty host
interference hits all levels, best-per-level reported.

Usage:
    python tools/scaling_control.py                 # levels 2 8 16 32
    python tools/scaling_control.py 2 8             # custom levels
Env: SPARKSEARCH_BENCH_CONVS / _ROUNDS / _RUNS as in bench.py.

Prints one JSON line:
  {"control": "tokenize+hash", "levels": {"2": tps, ...},
   "per_core": {"2": tps/2, ...}, "rounds": R, "turns": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROUNDS = int(os.environ.get("SPARKSEARCH_BENCH_ROUNDS", "4"))
N_RUNS = int(os.environ.get("SPARKSEARCH_BENCH_RUNS", "2"))


def _control_throughput_on(spark, src: str, runs: int, warmups: int):
    """(best turns/sec, n_turns) for the no-engine tokenize+hash job."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(src)
    n_turns = df.count()
    # same string-churn shape as the index build's tokenize stage, zero
    # engine code: split to words, hash every token, xor-combine (ANSI
    # sum would overflow; bit_xor cannot)
    def job():
        (df.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("t"))
           .agg(F.expr("bit_xor(xxhash64(t))").alias("h")).collect())
    for _ in range(warmups):
        job()
    best = float("inf")
    for _ in range(max(runs, 1)):
        t0 = time.time()
        job()
        best = min(best, time.time() - t0)
    return n_turns / best, n_turns


def _worker(cores: int, src: str) -> None:
    import bench
    first = True
    spark = bench._new_spark(cores)
    try:
        for line in sys.stdin:
            if line.strip() != "run":
                break
            tp, n = _control_throughput_on(
                spark, src, runs=N_RUNS, warmups=2 if first else 1)
            first = False
            print(json.dumps({"tp": tp, "turns": n}), flush=True)
    finally:
        spark.stop()


def main(levels) -> None:
    os.environ.setdefault("SPARKSEARCH_BENCH_MODE", "local")
    import bench
    boot = bench._new_spark(4)
    src = bench._transcript_parquet(boot)
    boot.stop()

    procs = {}
    for cores in levels:
        env = dict(os.environ)
        env["SPARKSEARCH_DRIVER_JAVA_OPTS"] = (
            f"-XX:+UseParallelGC -Xmn8g -XX:ParallelGCThreads={cores}")
        env["SPARKSEARCH_DRIVER_MEM"] = "16g"
        procs[cores] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cores), src],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env)

    best = {c: 0.0 for c in levels}
    turns = 0
    for _ in range(N_ROUNDS):
        for cores in levels:
            p = procs[cores]
            p.stdin.write("run\n")
            p.stdin.flush()
            r = json.loads(p.stdout.readline())
            best[cores] = max(best[cores], r["tp"])
            turns = r["turns"]
    for p in procs.values():
        try:
            p.stdin.write("exit\n")
            p.stdin.flush()
        except BrokenPipeError:
            pass
        p.wait(timeout=60)

    print(json.dumps({
        "control": "tokenize+hash (no engine code)",
        "levels": {str(c): round(best[c], 1) for c in levels},
        "per_core": {str(c): round(best[c] / c, 1) for c in levels},
        "rounds": N_ROUNDS, "turns": turns,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--worker":
        _worker(int(sys.argv[2]), sys.argv[3])
    else:
        lv = [int(a) for a in sys.argv[1:]] or [2, 8, 16, 32]
        main(lv)
