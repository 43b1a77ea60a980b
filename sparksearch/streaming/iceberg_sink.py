"""Iceberg exactly-once sink (environment-gated).

The north-star sink is an idempotent MERGE into Iceberg tables; this
container has no Iceberg runtime jars, so the default engine sink is the
epoch-keyed parquet segment layout (streaming.indexer — equivalent
exactly-once semantics). This module carries the Iceberg wiring so a
cluster WITH the jars can switch sinks without touching the indexer.
:class:`ParquetMergeSink` executes the SAME logical MERGE (shared key +
condition builders) with DataFrame ops, so the keying/idempotence
semantics are tested here even without the jars.

Usage (cluster with iceberg-spark-runtime on the classpath and a catalog
configured, e.g. spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog):

    sink = IcebergMergeSink(spark, "lake.search.postings")
    indexer = StreamingIndexer(..., )   # then pass sink.merge_batch to
    stream.writeStream.foreachBatch(sink.merge_batch)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(ImportError):
    pass


def _assert_iceberg(spark: SparkSession) -> None:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
    except Exception as exc:  # pragma: no cover - env without jars
        raise IcebergUnavailable(
            "Iceberg runtime jars not on the classpath; use the parquet "
            "segment sink (sparksearch.streaming.indexer) or add "
            "iceberg-spark-runtime to spark-submit --packages") from exc


class IcebergMergeSink:
    """foreachBatch body: MERGE the batch's postings into an Iceberg table
    keyed on (field, term, doc_id, epoch) — replayed epochs are no-ops."""

    def __init__(self, spark: SparkSession, table: str):
        _assert_iceberg(spark)
        self.spark = spark
        self.table = table
        spark.sql(f"""
            CREATE TABLE IF NOT EXISTS {table} (
              field STRING, term STRING, doc_id STRING, tf INT,
              positions ARRAY<INT>, len_q INT, epoch BIGINT, tb INT
            ) USING iceberg PARTITIONED BY (field, tb)""")

    def merge_batch(self, postings: DataFrame, epoch_id: int) -> None:
        batch = keyed_batch(postings, epoch_id)
        view = f"_ss_batch_{epoch_id}"
        batch.createOrReplaceTempView(view)
        self.spark.sql(f"""
            MERGE INTO {self.table} t
            USING {view} s
            ON  {merge_condition('t', 's')}
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")


# MERGE key: replaying a micro-batch re-MERGEs identical rows at the same
# epoch → MATCHED → UPDATE to the same values → no-op (exactly-once under
# at-least-once delivery).
MERGE_KEY = ("field", "term", "doc_id", "epoch")


def keyed_batch(postings: DataFrame, epoch_id: int) -> DataFrame:
    """Stamp a micro-batch with its epoch and term bucket — the row shape
    both MERGE sinks key on."""
    from pyspark.sql import functions as F
    from sparksearch.index import N_TERM_BUCKETS
    return (postings
            .withColumn("epoch", F.lit(int(epoch_id)))
            .withColumn("tb", F.pmod(F.xxhash64("term"),
                                     F.lit(N_TERM_BUCKETS))))


def merge_condition(t: str, s: str) -> str:
    return " AND ".join(f"{t}.{k} = {s}.{k}" for k in MERGE_KEY)


class ParquetMergeSink:
    """Jar-free twin of :class:`IcebergMergeSink`: executes the SAME
    logical MERGE (key :data:`MERGE_KEY`, matched→update, not-matched→
    insert) against a parquet directory with DataFrame ops + an atomic
    directory swap.  Exists so the MERGE keying/idempotence semantics the
    Iceberg sink relies on are executable and TESTED in environments
    without the Iceberg runtime; Iceberg does the identical upsert with
    file-level pruning instead of the full rewrite."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def merge_batch(self, postings: DataFrame, epoch_id: int) -> None:
        import os
        import shutil
        from pyspark.sql import functions as F  # noqa: F401
        batch = keyed_batch(postings, epoch_id).localCheckpoint(eager=True)
        if os.path.exists(f"{self.path}/_SUCCESS"):
            target = self.spark.read.parquet(self.path)
            # MERGE: rows whose key matches the batch take the batch's
            # values (UPDATE SET *); all others survive; batch rows with
            # no match INSERT.  anti-join + union == that exact semantic
            # because the batch carries full rows.
            kept = target.join(batch.select(*MERGE_KEY),
                               on=list(MERGE_KEY), how="left_anti")
            merged = kept.unionByName(batch.select(*target.columns))
        else:
            merged = batch
        tmp = self.path + "__merging"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").partitionBy("field", "tb").parquet(tmp)
        old = self.path + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
