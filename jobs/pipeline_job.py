"""Training-data pipeline job — dedup + quality + language-id over a
document corpus as a spark-submit entry point (the 100 TB curation path).

    zip -r /tmp/sparksearch.zip sparksearch
    spark-submit --py-files /tmp/sparksearch.zip jobs/pipeline_job.py \\
        --input /data/documents --output /data/curated \\
        --key doc_id --text text \\
        --minhash-threshold 0.8 --min-quality-tokens 5

Stages (each a bounded, shuffle-conscious DataFrame plan — see
PLANS.md):
1. exact dedup: md5 groupBy, keep the smallest key per hash group;
2. near dedup: MinHash + banded LSH candidates ≥ threshold, then
   --dedup-policy: ``canonical`` (default) closes the pair graph with
   distributed connected components and keeps exactly the minimum key
   per duplicate cluster; ``pairwise`` is the old drop-the-larger-key
   policy (cheaper by O(log² n) contraction rounds, but a cluster
   linked only through a dropped middle doc can survive twice);
3. decontaminate (optional): drop docs sharing word n-grams with an
   eval/benchmark parquet (--eval-set);
4. annotate: language id, quality scores, token counts, repetition
   signals; optional PII redaction (--redact-pii);
5. filter: configurable floors (tokens, distinct-token ratio) and
   repetition ceilings (dup-line / top-2-gram fractions);
6. re-balance (optional): per-source caps (--cap-per-source) and/or
   language temperature resampling (--lang-temperature);
7. write partitioned parquet (by lang_pred) + one JSON line of counters.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet documents dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text", default="text")
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--dedup-policy", choices=["canonical", "pairwise"],
                    default="canonical")
    ap.add_argument("--skip-near-dedup", action="store_true")
    ap.add_argument("--min-quality-tokens", type=int, default=0)
    ap.add_argument("--min-distinct-ratio", type=float, default=0.0)
    ap.add_argument("--eval-set", help="parquet of benchmark docs to "
                    "decontaminate against (same text column)")
    ap.add_argument("--contamination-ngram", type=int, default=8)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--max-dup-line-frac", type=float, default=1.0)
    ap.add_argument("--max-top2gram-frac", type=float, default=1.0)
    ap.add_argument("--cap-per-source", type=int, default=0)
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--lang-temperature", type=float, default=0.0,
                    help="alpha for share^alpha language re-balancing "
                    "(0 = off)")
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("sparksearch-pipeline")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    from sparksearch.pipeline import (exact_duplicates,
                                      minhash_near_duplicates,
                                      dedup_keep_first, dedup_canonical,
                                      language_id,
                                      quality_scores, token_counts,
                                      decontaminate, redact_pii,
                                      repetition_stats, balanced_sample,
                                      temperature_resample)

    docs = spark.read.parquet(args.input)
    counters = {"input": docs.count()}

    # 1. exact dedup (hash groupBy — one shuffle on the 16-byte md5)
    groups = exact_duplicates(docs, args.key, text_col=args.text)
    keep_exact = groups.select(F.col("keep_id").alias(args.key))
    docs = docs.join(keep_exact, args.key, "left_semi")
    counters["after_exact_dedup"] = docs.count()

    # 2. near dedup (sub-quadratic LSH candidates + exact verification)
    if not args.skip_near_dedup:
        pairs = minhash_near_duplicates(docs, args.key, text_col=args.text,
                                        threshold=args.minhash_threshold)
        if args.dedup_policy == "canonical":
            docs = dedup_canonical(docs, pairs, args.key)
        else:
            docs = dedup_keep_first(docs, pairs, args.key)
        counters["after_near_dedup"] = docs.count()

    # 3. decontaminate against an eval/benchmark set
    if args.eval_set:
        evals = spark.read.parquet(args.eval_set)
        docs = decontaminate(docs, evals, args.key, args.text,
                             n=args.contamination_ngram)
        counters["after_decontaminate"] = docs.count()

    # 4. annotate (all JVM column expressions appended in one pass —
    # no python and no joins on the hot path)
    ann = token_counts(quality_scores(language_id(docs, args.text),
                                      args.text), args.text)
    rep = repetition_stats(docs, args.key, args.text)
    ann = ann.join(rep, args.key)
    if args.redact_pii:
        # the redacted value REPLACES the text column — the shipped
        # corpus must not carry the original PII under the standard
        # column name downstream consumers read
        ann = (redact_pii(ann, args.text)
               .drop(args.text)
               .withColumnRenamed(f"{args.text}_redacted", args.text))

    # 5. quality floors + repetition ceilings
    if args.min_quality_tokens:
        ann = ann.filter(F.col("word_tokens") >= args.min_quality_tokens)
    if args.min_distinct_ratio:
        ann = ann.filter(F.col("distinct_token_ratio")
                         >= args.min_distinct_ratio)
    if args.max_dup_line_frac < 1.0:
        ann = ann.filter(F.col("dup_line_frac") <= args.max_dup_line_frac)
    if args.max_top2gram_frac < 1.0:
        ann = ann.filter(F.col("top_2gram_frac")
                         <= args.max_top2gram_frac)

    # 6. re-balance the mix
    if args.cap_per_source and args.source_col in ann.columns:
        ann = balanced_sample(ann, args.source_col, args.cap_per_source,
                              args.key)
    if args.lang_temperature:
        ann = temperature_resample(ann, "lang_pred", args.key,
                                   alpha=args.lang_temperature)

    # 7. partitioned write (lang partitioning → downstream jobs prune)
    ann.write.mode("overwrite").partitionBy("lang_pred").parquet(args.output)
    counters["output"] = spark.read.parquet(args.output).count()
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
