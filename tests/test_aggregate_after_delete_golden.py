"""aggregate_edgecases.out §2 parity — aggregates after deletion.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
aggregate_edgecases.out section 2: five rows are indexed, four deleted,
and every aggregate surface reflects the deletion —

- ``COUNT(*)`` over a match-all search returns **1**;
- ``pdb.agg value_count`` returns ``{"value": 1.0}``;
- ``pdb.agg stats`` returns avg=max=min=sum of the one survivor,
  count 1;
- the window form ``COUNT(*) OVER ()`` also returns 1.

Section 1's ``max_window_aggregate_response_bytes`` DSM-transport guard
is parallel-scan machinery; the engine's declared analog is the
``max_agg_buckets`` abort (tests/test_aggs.py).  Section 3's MVCC
visibility GUC has no analog — segment-manifest snapshots provide
reader isolation instead.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.search import count
from sparksearch.streaming.indexer import (StreamingIndexer, delete_docs,
                                           open_segmented_index)


@pytest.fixture(scope="module")
def deleted_index(spark, tmp_path_factory):
    tdir = str(tmp_path_factory.mktemp("aggdel"))
    # golden rows (1,'a')..(5,'e'); the streaming indexer keys docs as
    # conv_id#turn_idx
    rows = [(str(i), 0, chr(ord("a") + i - 1), i) for i in range(1, 6)]
    df = (spark.createDataFrame(
              rows, "conv_id string, turn_idx int, text string, num int")
          .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)
                                                + F.col("num"))))
    src = f"{tdir}/src"
    df.coalesce(1).write.parquet(src)

    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(schema, idx_path, ckpt)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = ix.start(stream)
    q.processAllAvailable()
    q.stop()

    # DELETE WHERE id > 1
    delete_docs(spark, idx_path, [f"{i}#0" for i in range(2, 6)])
    docs = df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id",
                              F.col("turn_idx").cast("string")))
    return open_segmented_index(spark, idx_path, schema, docs=docs)


def test_count_after_delete(deleted_index):
    assert count(deleted_index, ast.All()) == 1


def test_value_count_after_delete(deleted_index):
    res = search_aggregate(deleted_index, ast.All(),
                           {"v": {"value_count": {"field": "doc_id"}}})
    assert res["aggregations"]["v"] == {"value": 1.0}


def test_stats_after_delete(deleted_index):
    res = search_aggregate(deleted_index, ast.All(),
                           {"s": {"stats": {"field": "num"}}})
    s = res["aggregations"]["s"]
    assert s["count"] == 1
    assert s["avg"] == s["min"] == s["max"] == s["sum"] == 1.0


def test_window_count_after_delete(deleted_index):
    # COUNT(*) OVER () ... LIMIT 1 — the one-call page form
    from sparksearch.query.search import search_with_facets
    page = search_with_facets(deleted_index, ast.All(), limit=1,
                              window_aggs={"total": "count(*)"})
    assert page["aggregates"]["total"] == 1
    assert len(page["hits"]) == 1
