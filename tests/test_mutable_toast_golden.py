"""mutable-toast.out parity — oversized (TOASTed) doc values.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
mutable-toast.out.  A ~1.8 MB text value (200k repetitions of
'BigData_ ') must index and match; an UPDATE of the same row (new
version + tombstoned old, the golden's mutable segment shows
num_docs=2) must still return exactly one visible row; repeated updates
followed by a merge must keep working.  The engine's update analog is
tombstone + re-ingest; compaction is the merge.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import (StreamingIndexer, compact_segments,
                                           delete_docs, insert_docs,
                                           open_segmented_index)

BIG = "BigData_ " * 200_000  # ~1.8 MB, 200k tokens


def _write_batch(spark, path, version: int):
    df = (spark.createDataFrame(
              [("d1", 0, BIG, version)],
              "conv_id string, turn_idx int, text string, v int")
          .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)
                                                + F.col("v"))))
    df.coalesce(1).write.mode("append").parquet(path)


def _matches(spark, idx_path, schema):
    idx = open_segmented_index(spark, idx_path, schema)
    return [r["doc_id"] for r in
            compile_query(idx, ast.Match("text", "BigData_")).collect()]


def test_toasted_value_indexes_updates_and_merges(spark, tmp_path):
    tdir = str(tmp_path)
    src = f"{tdir}/src"
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"

    _write_batch(spark, src, 0)
    ix = StreamingIndexer(schema, idx_path, ckpt)
    stream = (spark.readStream
              .schema("conv_id string, turn_idx int, text string, "
                      "v int, ts timestamp").parquet(src))
    q = ix.start(stream)
    q.processAllAvailable()
    assert _matches(spark, idx_path, schema) == ["d1#0"]

    q.stop()
    # UPDATE: tombstone the old version, insert the new one (the stream
    # dedupes replayed natural keys, so updates go through the batch
    # aminsert path)
    delete_docs(spark, idx_path, ["d1#0"])
    new = spark.createDataFrame([("d1#0", BIG)], "doc_id string, text string")
    insert_docs(spark, idx_path, new, schema)
    assert _matches(spark, idx_path, schema) == ["d1#0"]

    # merge the segments; the survivor stays visible exactly once
    compact_segments(spark, idx_path, schema)
    assert _matches(spark, idx_path, schema) == ["d1#0"]

    # and the giant doc's stats stayed coherent (one visible doc)
    idx = open_segmented_index(spark, idx_path, schema)
    assert idx.meta["text"]["num_docs"] == 1
    assert idx.meta["text"]["avg_len"] == pytest.approx(200_000, rel=0.01)


def test_scoped_tombstones_survive_layered_merge(spark, tmp_path):
    """A layered merge keeps deleted rows physically (apply_deletes=False)
    — the source-scoped tombstones must follow their docs under the
    merged segment's name, while an updated key's NEW version (in a
    segment newer than the tombstone) stays visible through the merge."""
    from sparksearch.streaming.indexer import (_committed_segments,
                                               _segment_bytes,
                                               compact_layered)
    tdir = str(tmp_path)
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    idx_path = f"{tdir}/idx"

    # three insert segments of two docs each
    for b in range(3):
        df = spark.createDataFrame(
            [(f"d{b}#{i}", f"common tok{b}") for i in range(2)],
            "doc_id string, text string")
        insert_docs(spark, idx_path, df, schema)
    # delete one doc, then UPDATE another (delete + re-insert)
    delete_docs(spark, idx_path, ["d0#0"])
    delete_docs(spark, idx_path, ["d1#0"])
    insert_docs(spark, idx_path,
                spark.createDataFrame([("d1#0", "common updated")],
                                      "doc_id string, text string"), schema)

    def visible():
        idx = open_segmented_index(spark, idx_path, schema)
        return {r["doc_id"] for r in
                compile_query(idx, ast.Term("text", "common")).collect()}

    want = {"d0#1", "d1#0", "d1#1", "d2#0", "d2#1"}
    assert visible() == want

    # layered merge over everything (deletes NOT applied physically)
    segs = _committed_segments(idx_path)
    layer = int(sum(_segment_bytes(s) for s in segs) * 0.7)
    merged = compact_layered(spark, idx_path, schema, layer_sizes=[layer])
    assert merged, "expected a merge"
    assert visible() == want, "tombstones must follow docs into the merge"
