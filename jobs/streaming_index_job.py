"""Continuous BM25 indexing job — the north-star pipeline as a
spark-submit entry point.

Launch (cluster or local):

    zip -r /tmp/sparksearch.zip sparksearch
    spark-submit --py-files /tmp/sparksearch.zip \\
        jobs/streaming_index_job.py \\
        --input /data/transcripts_stream --index /data/bm25_index \\
        --checkpoint /data/ckpt --mode turn --watermark "2 minutes" \\
        --available-now

Reads the transcript stream (conv_id, turn_idx, role, text, tool, ts),
tokenizes + builds postings per micro-batch, and sinks immutable
epoch-keyed segments exactly-once; resumes from the checkpoint with
per-epoch lineage (see sparksearch.streaming.indexer).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet stream directory")
    ap.add_argument("--index", required=True, help="index output path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="turn", choices=["turn", "conversation"])
    ap.add_argument("--watermark", default="2 minutes")
    ap.add_argument("--session-gap", default="5 minutes")
    ap.add_argument("--max-files-per-trigger", type=int, default=0)
    ap.add_argument("--available-now", action="store_true",
                    help="drain available input then exit (batch-over-stream)")
    ap.add_argument("--processing-interval", default=None,
                    help="e.g. '10 seconds' for a continuous trigger")
    args = ap.parse_args()

    # master/deploy settings come from spark-submit; only job-level confs here
    spark = (SparkSession.builder.appName("sparksearch-streaming-indexer")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    # size the shuffle to the actual cluster unless explicitly configured
    if "spark.sql.shuffle.partitions" not in {
            k for k, _ in spark.sparkContext.getConf().getAll()}:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(spark.sparkContext.defaultParallelism))

    from sparksearch.fixtures import TRANSCRIPTS_SCHEMA
    from sparksearch.schema import IndexSchema, FieldConfig
    from sparksearch.streaming import StreamingIndexer

    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", args.max_files_per_trigger)
    stream = reader.parquet(args.input)

    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    ix = StreamingIndexer(schema, args.index, args.checkpoint,
                          watermark=args.watermark,
                          session_gap=args.session_gap, mode=args.mode)
    trigger = None
    if args.available_now:
        trigger = {"availableNow": True}
    elif args.processing_interval:
        trigger = {"processingTime": args.processing_interval}
    q = ix.start(stream, trigger=trigger)
    q.awaitTermination()


if __name__ == "__main__":
    main()
