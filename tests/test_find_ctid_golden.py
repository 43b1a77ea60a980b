"""find_ctid.out golden (PUBLIC reference behavior): resolve a physical
doc address to the row stored there.

The reference's ``paradedb.find_ctid('idx', '(0, 1)')`` looks up heap
ctid (block 0, offset 1) through the index; with one inserted row the
count is 1.  The engine's physical-address analog is
``(segment_idx, ordinal)`` — live-segment ordinal plus the 1-based
byte-order position of the key within that segment — so the same
golden shape holds: one doc, address (0, 1), count 1; any other
address (or a tombstoned key) resolves to nothing.

Ref: pg_search/tests/pg_regress/expected/find_ctid.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema
from sparksearch.api import find_ctid
from sparksearch.streaming.indexer import delete_docs, insert_docs


@pytest.fixture(scope="module")
def one_doc_index(spark, tmp_path_factory):
    tdir = str(tmp_path_factory.mktemp("findctid"))
    path = f"{tdir}/idx"
    schema = IndexSchema(key_field="id", text_fields=[FieldConfig(name="id")])
    docs = spark.createDataFrame([("1",)], "id string")
    insert_docs(spark, path, docs, schema)
    return path, schema


def test_find_ctid_one_row(spark, one_doc_index):
    path, _ = one_doc_index
    assert find_ctid(spark, path, "(0, 1)").count() == 1
    assert find_ctid(spark, path, "(0, 1)").collect()[0]["doc_id"] == "1"


def test_find_ctid_misses(spark, one_doc_index):
    path, _ = one_doc_index
    assert find_ctid(spark, path, "(0, 2)").count() == 0   # past the end
    assert find_ctid(spark, path, "(1, 1)").count() == 0   # no such segment


def test_find_ctid_malformed(spark, one_doc_index):
    path, _ = one_doc_index
    with pytest.raises(ValueError):
        find_ctid(spark, path, "0, 1")


def test_find_ctid_multi_segment_and_tombstone(spark, tmp_path_factory):
    """Address space is per-segment; deleting a key retires its ctid."""
    tdir = str(tmp_path_factory.mktemp("findctid2"))
    path = f"{tdir}/idx"
    schema = IndexSchema(key_field="id", text_fields=[FieldConfig(name="id")])
    insert_docs(spark, path,
                spark.createDataFrame([("a",), ("b",)], "id string"), schema)
    insert_docs(spark, path,
                spark.createDataFrame([("c",)], "id string"), schema)
    assert find_ctid(spark, path, "(0, 2)").collect()[0]["doc_id"] == "b"
    assert find_ctid(spark, path, "(1, 1)").collect()[0]["doc_id"] == "c"
    delete_docs(spark, path, ["b"])
    got = {r["doc_id"] for r in find_ctid(spark, path, "(0, 2)").collect()}
    assert "b" not in got
