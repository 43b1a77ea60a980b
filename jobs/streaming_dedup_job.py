"""Continuous ingest-time near-duplicate detection as a spark-submit
entry point (streaming twin of the pipeline job's dedup stages).

    zip -r /tmp/sparksearch.zip sparksearch
    spark-submit --py-files /tmp/sparksearch.zip \\
        jobs/streaming_dedup_job.py \\
        --input /data/docs_stream --output /data/near_dup_pairs \\
        --checkpoint /data/dedup_ckpt --key doc_id --text text \\
        --threshold 0.7 --available-now

Reads a document stream, maintains per-LSH-bucket member signatures in
the state store (sparksearch.streaming.dedup), and appends each newly
detected (a, b, est_jaccard) near-dup pair to the output parquet
exactly once — replays re-emit nothing, so the pair log is safe to
consume incrementally.  Warm-start: place the existing corpus files in
the input directory with the earliest mtimes; they populate bucket
state before live arrivals (see the module docstring).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet stream directory")
    ap.add_argument("--output", required=True, help="pair-log parquet path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text", default="text")
    ap.add_argument("--key-type", default="long",
                    help="spark type of the key column (schema inference "
                    "is unavailable on file streams)")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--n-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--max-members", type=int, default=512)
    ap.add_argument("--max-files-per-trigger", type=int, default=0)
    ap.add_argument("--available-now", action="store_true")
    ap.add_argument("--processing-interval", default=None)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("sparksearch-streaming-dedup")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    if "spark.sql.shuffle.partitions" not in {
            k for k, _ in spark.sparkContext.getConf().getAll()}:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(spark.sparkContext.defaultParallelism))

    from sparksearch.streaming import streaming_near_duplicates

    reader = spark.readStream.schema(
        f"{args.key} {args.key_type}, {args.text} string")
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               args.max_files_per_trigger)
    stream = reader.parquet(args.input)

    pairs = streaming_near_duplicates(
        stream, args.key, text_col=args.text, threshold=args.threshold,
        n_hashes=args.n_hashes, bands=args.bands,
        max_members=args.max_members, output_mode="append")
    writer = (pairs.writeStream.outputMode("append").format("parquet")
              .option("path", args.output)
              .option("checkpointLocation", args.checkpoint))
    if args.available_now:
        writer = writer.trigger(availableNow=True)
    elif args.processing_interval:
        writer = writer.trigger(processingTime=args.processing_interval)
    q = writer.start()
    q.awaitTermination()


if __name__ == "__main__":
    main()
