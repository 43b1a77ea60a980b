"""composite_advanced.out golden (PUBLIC reference behavior): the
35k-row parallel build over a 3-attribute composite field with
per-sub-field parse queries across the full id range, and the MVCC
visibility section — UPDATE/DELETE/INSERT through the segmented index
leave old versions invisible, new versions visible, the segment count
grows, and total indexed doc versions exceed the visible count.

Ref: pg_search/tests/pg_regress/expected/composite_advanced.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

LOREM1 = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua")
LOREM2 = ("ut enim ad minim veniam quis nostrud exercitation ullamco "
          "laboris nisi ut aliquip ex ea commodo consequat duis aute "
          "irure")
LOREM3 = ("dolor in reprehenderit in voluptate velit esse cillum dolore "
          "eu fugiat nulla pariatur excepteur sint occaecat cupidatat non")


@pytest.fixture(scope="module")
def par(spark):
    docs = (spark.range(1, 35001)
            .select(F.col("id"),
                    F.struct(
                        F.concat(F.lit("field1_"), F.col("id"),
                                 F.lit(" " + LOREM1)).alias("f1"),
                        F.concat(F.lit("field2_"), F.col("id"),
                                 F.lit(" " + LOREM2)).alias("f2"),
                        F.concat(F.lit("field3_"), F.col("id"),
                                 F.lit(" " + LOREM3)).alias("f3"))
                    .alias("comp")))
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="f1", source="comp.f1"),
                     FieldConfig(name="f2", source="comp.f2"),
                     FieldConfig(name="f3", source="comp.f3")]))
    return idx


def _n(idx, q):
    return compile_query(idx, ast.Parse(q)).count()


def test_parallel_build_doc_count(par):
    assert par.docs.count() == 35000


def test_sub_field_point_lookups(par):
    assert _n(par, "f1:field1_5000") == 1
    assert _n(par, "f2:field2_1") == 1
    assert _n(par, "f3:field3_35000") == 1


def test_range_or_lookups(par):
    assert _n(par, "f1:field1_1 OR f1:field1_50 OR f1:field1_100") == 3
    assert _n(par, "f1:field1_34998 OR f1:field1_34999 OR "
                   "f1:field1_35000") == 3


def test_mvcc_update_delete_insert_visibility(spark, tmp_path):
    """MVCC section: old versions invisible, new visible, segments grow,
    total indexed versions > visible rows (dead versions await vacuum)."""
    from sparksearch.api import index_segments
    from sparksearch.streaming.indexer import (delete_docs, insert_docs,
                                               open_segmented_index)
    path = str(tmp_path / "idx_mvcc")
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="content")])
    base = spark.createDataFrame(
        [(1, "unique_alpha_one"), (2, "unique_beta_two"),
         (3, "unique_gamma_three")], "id int, content string")
    insert_docs(spark, path, base, schema)
    assert len([s for s in index_segments(path) if s["live"]]) == 1

    # UPDATE row 1 (new version + tombstone), DELETE row 2, INSERT row 4
    delete_docs(spark, path, [1, 2])
    mods = spark.createDataFrame(
        [(1, "unique_delta_updated"), (4, "unique_epsilon_new")],
        "id int, content string")
    insert_docs(spark, path, mods, schema)

    heap = (base.filter(~F.col("id").isin(1, 2))
            .unionByName(mods))  # visible heap after the transaction
    idx = open_segmented_index(spark, path, schema, docs=heap)

    def n(term):
        return compile_query(idx, ast.Parse(f"content:{term}")).count()

    assert n("unique_beta_two") == 0        # deleted
    assert n("unique_alpha_one") == 0       # old version of updated row
    assert n("unique_delta_updated") == 1   # new version
    assert n("unique_gamma_three") == 1     # untouched
    assert n("unique_epsilon_new") == 1     # inserted
    assert heap.count() == 3                # total visible

    segs = [s for s in index_segments(path) if s["live"]]
    assert len(segs) == 2                   # modify wrote a new segment
    assert sum(s["n_docs"] for s in segs) == 5  # dead versions counted
