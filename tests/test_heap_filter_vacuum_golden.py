"""heap_filter_vacuum.out golden (PUBLIC reference behavior, issue
#4333): BM25 queries with heap_filter predicates over a NON-indexed
column must keep answering correctly after rows are deleted and the
table is VACUUMed (physical reclamation).  5000 rows of 'the quick
brown fox...' with extra = i % 10: before the delete the heap-filtered
count is 500; after ``DELETE WHERE id > 1000`` + VACUUM it is 100, and
the plain search count is 1000.  The engine's delete is a scoped
tombstone; VACUUM is full compaction with apply_deletes=True, which
physically rewrites the postings without the victims.

Ref: pg_search/tests/pg_regress/expected/heap_filter_vacuum.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.search import count
from sparksearch.streaming.indexer import (_committed_segments,
                                           compact_segments, delete_docs,
                                           insert_docs, open_segmented_index)

BODY = "the quick brown fox jumps over the lazy dog"


def _docs(spark, lo, hi):
    return (spark.range(lo, hi + 1)
            .select(F.col("id").cast("string").alias("doc_id"),
                    F.lit(BODY).alias("body"),
                    F.pmod(F.col("id"), F.lit(10)).cast("int")
                    .alias("extra")))


def _open(spark, idx_path, schema, docs):
    return open_segmented_index(spark, idx_path, schema, docs=docs)


HF = ast.HeapFilter(ast.Parse("fox", field="body"), "extra = 5")


def test_heap_filter_survives_delete_and_vacuum(spark, tmp_path):
    tdir = str(tmp_path)
    idx_path = f"{tdir}/idx"
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="body")])
    # two insert segments spanning the id space (the golden's 5000 rows
    # span many heap pages; two segments give VACUUM something to merge)
    insert_docs(spark, idx_path, _docs(spark, 1, 2500), schema)
    insert_docs(spark, idx_path, _docs(spark, 2501, 5000), schema)
    docs = _docs(spark, 1, 5000)

    # baseline: heap_filter over the non-indexed column works
    assert count(_open(spark, idx_path, schema, docs), HF) == 500

    # DELETE WHERE id > 1000
    delete_docs(spark, idx_path, [str(i) for i in range(1001, 5001)])
    live = docs.filter(F.col("doc_id").cast("long") <= 1000)

    # the tombstoned index answers correctly BEFORE vacuum...
    assert count(_open(spark, idx_path, schema, live), HF) == 100

    # VACUUM: physical compaction applies the tombstones
    compact_segments(spark, idx_path, schema)
    segs = _committed_segments(idx_path)
    assert len(segs) == 1  # merged into one base segment

    idx = _open(spark, idx_path, schema, live)
    # heap_filter path after vacuum (the issue-#4333 crash shape)
    assert count(idx, HF) == 100
    # and the plain BM25 query still works
    assert count(idx, ast.Parse("fox", field="body")) == 1000

    # the vacuumed postings are PHYSICALLY gone, not just filtered
    import os
    postings = spark.read.parquet(os.path.join(segs[0], "postings"))
    assert postings.select("doc_id").distinct().count() == 1000
