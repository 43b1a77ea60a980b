"""Iceberg exactly-once sink (environment-gated).

The north-star sink is an idempotent MERGE into Iceberg tables; this
container has no Iceberg runtime jars, so the default engine sink is the
epoch-keyed parquet segment layout (streaming.indexer — equivalent
exactly-once semantics). This module carries the Iceberg wiring so a
cluster WITH the jars can switch sinks without touching the indexer.

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
        from pyspark.sql import functions as F
        from sparksearch.index import N_TERM_BUCKETS
        batch = (postings
                 .withColumn("epoch", F.lit(int(epoch_id)))
                 .withColumn("tb", F.pmod(F.xxhash64("term"),
                                          F.lit(N_TERM_BUCKETS))))
        view = f"_ss_batch_{epoch_id}"
        batch.createOrReplaceTempView(view)
        self.spark.sql(f"""
            MERGE INTO {self.table} t
            USING {view} s
            ON  t.field = s.field AND t.term = s.term
            AND t.doc_id = s.doc_id AND t.epoch = s.epoch
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
