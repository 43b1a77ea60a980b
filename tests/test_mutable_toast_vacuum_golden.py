"""mutable-toast-vacuum.out golden (PUBLIC reference behavior, issue
#5365 VACUUM half): VACUUM over large (toasted) mutable-segment rows
must succeed, physically reclaim the dead versions, and leave the rest
searchable — six ~1.8 MB docs; delete 2 and 4, update 6, VACUUM → ids
1, 3, 5, 6 (count 4); ten more update-churn cycles on id 1 plus a
second VACUUM still count 4 with id 1 visible exactly once.

Ref: pg_search/tests/pg_regress/expected/mutable-toast-vacuum.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import (_committed_segments,
                                           compact_segments, delete_docs,
                                           insert_docs,
                                           open_segmented_index)

BIG = "BigData_ " * 200_000


def _docs(spark, ids):
    return (spark.createDataFrame([(str(i),) for i in ids],
                                  "doc_id string")
            .withColumn("doc_text", F.lit(BIG)))


def test_vacuum_reclaims_toasted_mutable_rows(spark, tmp_path):
    idx_path = f"{tmp_path}/idx"
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="doc_text")])
    insert_docs(spark, idx_path, _docs(spark, [1, 2, 3]), schema)
    insert_docs(spark, idx_path, _docs(spark, [4, 5, 6]), schema)

    def _ids():
        idx = open_segmented_index(spark, idx_path, schema)
        return sorted(int(r["doc_id"]) for r in compile_query(
            idx, ast.Match("doc_text", "BigData_")).collect())

    assert _ids() == [1, 2, 3, 4, 5, 6]

    # DELETE 2, 4; UPDATE 6 (tombstone + new version); VACUUM
    delete_docs(spark, idx_path, ["2", "4"])
    delete_docs(spark, idx_path, ["6"])
    insert_docs(spark, idx_path, _docs(spark, [6]), schema)
    compact_segments(spark, idx_path, schema)
    assert _ids() == [1, 3, 5, 6]

    # churn: ten update cycles on id 1, then VACUUM again
    for _ in range(10):
        delete_docs(spark, idx_path, ["1"])
        insert_docs(spark, idx_path, _docs(spark, [1]), schema)
    compact_segments(spark, idx_path, schema)
    assert _ids() == [1, 3, 5, 6]
    assert len(_committed_segments(idx_path)) == 1
