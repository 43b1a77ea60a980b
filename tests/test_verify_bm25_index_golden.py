"""verify_bm25_index.out golden (PUBLIC reference behavior): the
amcheck-style index verification family — pdb.verify_index check rows
(schema_valid / index_readable / checksums_valid /
segment_metadata_valid, plus ctid_field_valid + heap_references_valid
under heapallindexed), sample_rate, segment_ids partial verification
("K of N" details), pdb.index_segments ordinals, pdb.indexes(),
pdb.verify_all_indexes(index_pattern), on_error_stop natural check
order, and dangling-reference corruption detection ("5 of 50").

Ref: pg_search/tests/pg_regress/expected/verify_bm25_index.out
"""

import os

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema
from sparksearch.api import (index_segments, indexes, verify_all_indexes,
                             verify_index_report)
from sparksearch.streaming.indexer import delete_docs, insert_docs

SCHEMA = IndexSchema(key_field="id",
                     text_fields=[FieldConfig(name="content"),
                                  FieldConfig(name="category")])

BATCH1 = [
    (1, "hello world", "greeting", 10),
    (2, "goodbye world", "farewell", 20),
    (3, "search engine", "technology", 30),
    (4, "full text search", "technology", 40),
    (5, "paradedb postgres", "database", 50),
]
BATCH2 = [
    (6, "additional content", "misc", 60),
    (7, "more data here", "misc", 70),
    (8, "testing segments", "test", 80),
    (9, "multiple batches", "test", 90),
    (10, "segment creation", "test", 100),
]
DDL = "id int, content string, category string, score int"

BASE_CHECKS = ["checksums_valid", "index_readable", "schema_valid",
               "segment_metadata_valid"]
HEAP_CHECKS = sorted(BASE_CHECKS + ["ctid_field_valid",
                                    "heap_references_valid"])


def _checks(rows, name):
    return sorted((r["check_name"].replace(f"{name}: ", ""), r["passed"])
                  for r in rows)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("verify") / "verify_test_idx")
    b1 = spark.createDataFrame(BATCH1, DDL)
    b2 = spark.createDataFrame(BATCH2, DDL)
    insert_docs(spark, path, b1, SCHEMA)
    insert_docs(spark, path, b2, SCHEMA)
    heap = b1.unionByName(b2)
    return path, heap


def test_1_basic_verification(spark, idx):
    path, _ = idx
    rows = verify_index_report(spark, path, "verify_test_idx")
    assert _checks(rows, "verify_test_idx") == \
        [(c, True) for c in BASE_CHECKS]


def test_2_heapallindexed(spark, idx):
    path, heap = idx
    rows = verify_index_report(spark, path, "verify_test_idx",
                               heapallindexed=True, heap=heap,
                               key_field="id")
    assert _checks(rows, "verify_test_idx") == \
        [(c, True) for c in HEAP_CHECKS]


def test_3_4_verify_after_more_data(spark, idx):
    """Tests 3-4: a third batch of 100 rows; both forms stay green."""
    path, heap = idx
    more = spark.createDataFrame(
        [(10 + i, f"test content {i}",
          "even" if i % 2 == 0 else "odd", i) for i in range(1, 101)], DDL)
    insert_docs(spark, path, more, SCHEMA)
    heap = heap.unionByName(more)
    rows = verify_index_report(spark, path, "verify_test_idx")
    assert all(r["passed"] for r in rows) and len(rows) == 4
    rows = verify_index_report(spark, path, "verify_test_idx",
                               heapallindexed=True, heap=heap,
                               key_field="id")
    assert all(r["passed"] for r in rows) and len(rows) == 6


def test_5_6_verify_after_deletes_and_vacuum(spark, idx):
    """Tests 5-6: DELETE id <= 3 + vacuum; verification stays green
    (tombstoned keys are not dangling references)."""
    path, heap = idx
    more = spark.createDataFrame(
        [(10 + i, f"test content {i}",
          "even" if i % 2 == 0 else "odd", i) for i in range(1, 101)], DDL)
    heap = heap.unionByName(more).filter(F.col("id") > 3)
    delete_docs(spark, path, [1, 2, 3])
    from sparksearch.api import force_merge
    force_merge(spark, path, SCHEMA, oneshot=True)  # VACUUM analog
    rows = verify_index_report(spark, path, "verify_test_idx")
    assert all(r["passed"] for r in rows) and len(rows) == 4
    rows = verify_index_report(spark, path, "verify_test_idx",
                               heapallindexed=True, heap=heap,
                               key_field="id")
    assert all(r["passed"] for r in rows) and len(rows) == 6


def test_7_search_still_works(spark, idx):
    """Test 7: content @@@ 'test' ORDER BY id LIMIT 5 after the above."""
    path, _ = idx
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    from sparksearch.streaming.indexer import open_segmented_index
    ix = open_segmented_index(spark, path, SCHEMA)
    m = compile_query(ix, ast.Parse("test", field="content"))
    got = (m.orderBy(F.col("doc_id").cast("int")).limit(5)
           .select("doc_id").collect())
    assert [int(r["doc_id"]) for r in got] == [11, 12, 13, 14, 15]


def test_8_sampling(spark, tmp_path):
    """Test 8: sample_rate marks the heap check details 'sampled'."""
    path = str(tmp_path / "verify_sampling_idx")
    for b in range(4):
        docs = spark.createDataFrame(
            [(b * 250 + i, f"batch{b + 1} content {i}", "c", i)
             for i in range(1, 251)], DDL)
        insert_docs(spark, path, docs, SCHEMA)
    heap = spark.range(1, 1001).select(F.col("id").cast("int"))
    rows = verify_index_report(spark, path, "verify_sampling_idx",
                               heapallindexed=True, sample_rate=0.5,
                               heap=heap, key_field="id")
    hr = [r for r in rows
          if "heap_references" in r["check_name"]]
    assert len(hr) == 1 and hr[0]["passed"]
    assert "sampled" in hr[0]["details"]


@pytest.fixture(scope="module")
def par_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("verify") / "verify_parallel_idx")
    for b in range(4):
        docs = spark.createDataFrame(
            [(b * 50 + i, f"batch{b + 1} {i}", "c", i)
             for i in range(1, 51)], DDL)
        insert_docs(spark, path, docs, SCHEMA)
    return path


def test_9_segment_ids_partial_verification(spark, par_idx):
    segs = index_segments(par_idx)
    assert len([s for s in segs if s["live"]]) >= 4

    def meta_row(**kw):
        rows = verify_index_report(spark, par_idx, "verify_parallel_idx",
                                   **kw)
        return [r for r in rows
                if "segment_metadata" in r["check_name"]][0]

    r = meta_row(segment_ids=[0])
    assert r["passed"] and "1 of" in r["details"]
    r = meta_row(segment_ids=[])
    assert r["passed"] and "0 of" in r["details"]
    r = meta_row(segment_ids=None)
    assert r["passed"] and " of " not in r["details"]
    r = meta_row(segment_ids=[999])
    assert "0 of" in r["details"]


def test_10_index_segments_ordinals(spark, par_idx):
    segs = [s for s in index_segments(par_idx) if s["live"]]
    assert len(segs) >= 4
    idxs = [s["segment_idx"] for s in segs]
    assert all(i >= 0 for i in idxs)
    assert len(set(idxs)) == len(idxs)
    # even-indexed subset verifies as partial
    even = [i for i in idxs if i % 2 == 0]
    rows = verify_index_report(spark, par_idx, "verify_parallel_idx",
                               heapallindexed=True, segment_ids=even,
                               heap=spark.range(1, 201)
                               .select(F.col("id").cast("int")),
                               key_field="id")
    r = [x for x in rows if "segment_metadata" in x["check_name"]][0]
    assert r["passed"] and "of" in r["details"]


def test_11_12_indexes_and_verify_all(spark, tmp_path):
    root = str(tmp_path)
    for name, word in [("test_all_idx1", "test"), ("test_all_idx2", "doc")]:
        for b in range(2):
            docs = spark.createDataFrame(
                [(b * 10 + i, f"{word}{i}", "c", i) for i in range(1, 11)],
                DDL)
            insert_docs(spark, os.path.join(root, name), docs, SCHEMA)
    got = [(ix["indexname"], ix["num_segments"] > 0, ix["total_docs"] > 0)
           for ix in indexes(spark, root)]
    assert got == [("test_all_idx1", True, True),
                   ("test_all_idx2", True, True)]
    rows = verify_all_indexes(spark, root, index_pattern="test_all%")
    assert sorted({r["indexname"] for r in rows}) == \
        ["test_all_idx1", "test_all_idx2"]
    assert all(r["passed"] for r in rows)
    assert len(rows) == 8  # 4 checks × 2 indexes


def test_13_on_error_stop_natural_order(spark, par_idx):
    """Test 13: checks come back in insertion order when nothing fails."""
    rows = verify_index_report(spark, par_idx, "verify_parallel_idx",
                               on_error_stop=True)
    assert [r["check_name"].split(": ")[1] for r in rows] == \
        ["schema_valid", "index_readable", "checksums_valid",
         "segment_metadata_valid"]
    assert all(r["passed"] for r in rows)


def test_14_corruption_detection(spark, tmp_path):
    """Test 14: heap rows removed without index maintenance → dangling
    index entries; heap_references_valid fails with '5 of 50' while
    ctid_field_valid stays true."""
    path = str(tmp_path / "corruption_idx")
    d1 = spark.createDataFrame(
        [(i, f"document {i}", "c", i) for i in range(1, 26)], DDL)
    d2 = spark.createDataFrame(
        [(i, f"document {i}", "c", i) for i in range(26, 51)], DDL)
    insert_docs(spark, path, d1, SCHEMA)
    insert_docs(spark, path, d2, SCHEMA)
    heap = d1.unionByName(d2)

    before = verify_index_report(spark, path, "corruption_idx",
                                 heapallindexed=True, heap=heap,
                                 key_field="id")
    hc = {r["check_name"].split(": ")[1]: r for r in before
          if "heap" in r["check_name"] or "ctid" in r["check_name"]}
    assert hc["ctid_field_valid"]["passed"]
    assert hc["heap_references_valid"]["passed"]

    corrupted = heap.filter(F.col("id") > 5)  # heap loses 5 rows
    after = verify_index_report(spark, path, "corruption_idx",
                                heapallindexed=True, heap=corrupted,
                                key_field="id")
    hc = {r["check_name"].split(": ")[1]: r for r in after
          if "heap" in r["check_name"] or "ctid" in r["check_name"]}
    assert hc["ctid_field_valid"]["passed"]
    assert not hc["heap_references_valid"]["passed"]
    assert "5 of 50" in hc["heap_references_valid"]["details"]
