"""aggregate-udf.out golden (PUBLIC reference behavior, PR #2625):
``paradedb.aggregate(index, all(), '{"average": {"avg": {"field":
"v"}}}')`` is stable across segment layouts and execution modes — one
segment, then seven segments (each INSERT of v = 1..1000 lands as its
own segment), always ``{"average": {"value": 500.5}}``.  The
reference's parallel_leader_participation / max_parallel_workers
permutations are executor-scheduling knobs with no analog (Spark owns
task scheduling); the invariant they protect — aggregate results don't
depend on how the scan is parallelized — is pinned by varying the
segment count and shuffle partitioning instead.

Ref: pg_search/tests/pg_regress/expected/aggregate-udf.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.api import aggregate
from sparksearch.query import ast
from sparksearch.streaming.indexer import insert_docs, open_segmented_index

AVG = {"average": {"avg": {"field": "v"}}}
WORDS = ["alpha", "bravo", "charlie", "delta", "echo"]


def _batch(spark, b):
    return (spark.range(1, 1001)
            .select(F.concat(F.lit(f"b{b}_"), F.col("id").cast("string"))
                    .alias("doc_id"),
                    F.element_at(F.array(*[F.lit(w) for w in WORDS]),
                                 (F.col("id") % 5 + 1).cast("int"))
                    .alias("k"),
                    F.col("id").cast("double").alias("v")))


def test_avg_stable_across_segment_counts(spark, tmp_path):
    idx_path = f"{tmp_path}/idx"
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="k")],
                         numeric_fields=["v"])

    # one segment
    docs = _batch(spark, 0)
    insert_docs(spark, idx_path, docs, schema)
    idx = open_segmented_index(spark, idx_path, schema, docs=docs)
    res = aggregate(idx, ast.All(), AVG)
    assert res["aggregations"]["average"] == {"value": 500.5}

    # six more segments (v repeats 1..1000 per segment, so the average
    # is unchanged — the golden's multi-segment sections)
    for b in range(1, 7):
        batch = _batch(spark, b)
        insert_docs(spark, idx_path, batch, schema)
        docs = docs.unionByName(batch)
    idx = open_segmented_index(spark, idx_path, schema, docs=docs)
    assert idx.docs.count() == 7000
    res = aggregate(idx, ast.All(), AVG)
    assert res["aggregations"]["average"] == {"value": 500.5}

    # and independent of scan parallelism (the reference's
    # max_parallel_workers=0 serial run): a single-partition replan
    # returns the identical value
    from sparksearch.aggs import run_aggs
    res = run_aggs(idx.docs.coalesce(1), AVG, schema=schema)
    assert res["aggregations"]["average"] == {"value": 500.5}
