"""SparkSession factory with scale-appropriate defaults.

Local mode is for tests/bench only; the same confs are what we would
submit with ``spark-submit --py-files`` on a real cluster (AQE, Arrow,
skew-join handling, shuffle partitions sized to cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparksearch",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``local[*]``. On a real cluster the master comes
    from spark-submit and these confs still apply.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARKSEARCH_DRIVER_MEM", "24g"))
        # throughput-oriented collector: the HOF/codegen analyzer paths are
        # allocation-heavy and G1 showed progressive-degradation pathologies
        # in local mode at 32 mutator threads
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARKSEARCH_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"))
        .config("spark.local.dir", os.environ.get("SPARKSEARCH_LOCAL_DIR", "/dev/shm/sparksearch-local"))
        .config("spark.sql.shuffle.spill.compress", "true")
        # v2 commit: task-side file moves at task completion (parallel)
        # instead of the driver serially renaming every output file at job
        # end — the v1 commit is a per-job fixed cost that grows with file
        # count and does not scale with executors
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
