"""Query job — run a search against a segmented index from spark-submit.

    spark-submit --py-files /tmp/sparksearch.zip jobs/search_job.py \\
        --index /data/bm25_index --query 'zephyr AND quasar' --limit 10
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--limit", type=int, default=10)
    args = ap.parse_args()

    spark = (SparkSession.builder.appName("sparksearch-query")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from sparksearch.schema import IndexSchema, FieldConfig
    from sparksearch.streaming import open_segmented_index
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    from pyspark.sql import functions as F

    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    idx = open_segmented_index(spark, args.index, schema)
    res = (compile_query(idx, ast.Parse(args.query))
           .orderBy(F.col("score").desc(), F.col("doc_id").asc())
           .limit(args.limit))
    for r in res.collect():
        print(f"{r['doc_id']}\t{r['score']:.6f}")


if __name__ == "__main__":
    main()
