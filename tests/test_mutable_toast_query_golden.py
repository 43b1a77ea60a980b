"""mutable-toast-query.out golden (PUBLIC reference behavior, issue
#5365 query half): a segment holding a mix of live, updated, and
deleted LARGE (toasted) rows must return exactly the statement-visible
rows — six ~1.8 MB docs; update id 3 (tombstone + new version), delete
ids 2 and 5; the search returns 1, 3, 4, 6 (id 3 exactly once), the
count is 4, and reading the matched rows' content (the detoast path)
still works.

Ref: pg_search/tests/pg_regress/expected/mutable-toast-query.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import (delete_docs, insert_docs,
                                           open_segmented_index)

BIG = "BigData_ " * 200_000   # ~1.8 MB


def _docs(spark, ids):
    return (spark.createDataFrame([(str(i),) for i in ids],
                                  "doc_id string")
            .withColumn("doc_text", F.lit(BIG)))


def test_mixed_visibility_of_toasted_rows(spark, tmp_path):
    idx_path = f"{tmp_path}/idx"
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="doc_text")])
    # two insert batches → mutable-segment mix like the golden's
    # mutable_segment_rows=2 layout
    insert_docs(spark, idx_path, _docs(spark, [1, 2, 3]), schema)
    insert_docs(spark, idx_path, _docs(spark, [4, 5, 6]), schema)

    def _ids():
        idx = open_segmented_index(spark, idx_path, schema)
        m = compile_query(idx, ast.Match("doc_text", "BigData_"))
        return sorted(int(r["doc_id"]) for r in m.collect())

    assert _ids() == [1, 2, 3, 4, 5, 6]

    # UPDATE id 3 (tombstone old version + insert new), DELETE 2 and 5
    delete_docs(spark, idx_path, ["3"])
    insert_docs(spark, idx_path, _docs(spark, [3]), schema)
    delete_docs(spark, idx_path, ["2", "5"])

    assert _ids() == [1, 3, 4, 6]

    idx = open_segmented_index(spark, idx_path, schema)
    assert compile_query(idx, ast.Match("doc_text", "BigData_")) \
        .count() == 4

    # detoast path: read the visible rows' content through the match
    live = _docs(spark, [1, 3, 4, 6])
    m = compile_query(idx, ast.Match("doc_text", "BigData_")) \
        .select("doc_id")
    got = (live.join(m, "doc_id")
           .select("doc_id", F.substring("doc_text", 1, 8).alias("p"))
           .orderBy(F.col("doc_id").cast("int")).collect())
    assert [(int(r["doc_id"]), r["p"]) for r in got] == \
        [(1, "BigData_"), (3, "BigData_"), (4, "BigData_"),
         (6, "BigData_")]
