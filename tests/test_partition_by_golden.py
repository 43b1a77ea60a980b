"""partition_by.out golden (PUBLIC reference behavior): the
``partition_by`` index option — segments physically split by field
values.  Spark analog: the saved docs table is written with hive-style
``partitionBy`` on those columns, so attribute filters on a partition
column prune whole directories (the reference's segment skip).

Pinned: single/multi/whitespace field lists parse; empty string
disables; whitespace-only or commas-only error; nonexistent columns
error; multi-valued columns (arrays, maps, json fields, aliased array
expressions) error — all with the reference's message strings — plus
the partition-pruned scan shape.

Ref: pg_search/tests/pg_regress/expected/partition_by.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.index import build_and_save


def _schema(partition_by, fields=None):
    return IndexSchema(
        key_field="id",
        text_fields=fields or [FieldConfig(name="name")],
        partition_by=partition_by)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "Alice", 1, "2023-01-01"), (2, "Bob", 2, "2023-06-01"),
         (3, "Charlie", 1, "2023-12-01")],
        "id long, name string, tenant_id int, created_at string")


# ============================================================
# Section 1: syntax validation
# ============================================================

def test_single_field(docs):
    assert _schema("tenant_id").partition_fields(docs.schema) == \
        ["tenant_id"]


def test_multiple_fields(docs):
    assert _schema("tenant_id, created_at").partition_fields(docs.schema) \
        == ["tenant_id", "created_at"]


def test_whitespace_around_fields(docs):
    assert _schema(" tenant_id ,  created_at ").partition_fields(
        docs.schema) == ["tenant_id", "created_at"]


def test_empty_string_disables(docs):
    assert _schema("").partition_fields(docs.schema) == []
    assert _schema(None).partition_fields(docs.schema) == []


# ============================================================
# Section 2: error cases
# ============================================================

def test_nonexistent_field_errors(docs):
    with pytest.raises(ValueError,
                       match=r"`nonexistent` in `partition_by` does "
                             "not exist"):
        _schema("nonexistent").partition_fields(docs.schema)


@pytest.mark.parametrize("raw", ["   ", ",", " , "])
def test_degenerate_lists_error(docs, raw):
    with pytest.raises(ValueError,
                       match="invalid partition_by value: must specify "
                             "at least one field"):
        _schema(raw).partition_fields(docs.schema)


# ============================================================
# Section 3: multi-valued fields error
# ============================================================

def test_array_field_errors(spark):
    d = spark.createDataFrame([(1, ["a"], "x")],
                              "id long, tags array<string>, name string")
    with pytest.raises(ValueError,
                       match="`tags` cannot be used in `partition_by` "
                             "because it is a multi-valued field"):
        _schema("tags").partition_fields(d.schema)


def test_json_field_errors(spark):
    d = spark.createDataFrame([(1, '{"a": 1}', "x")],
                              "id long, meta string, name string")
    schema = _schema("meta", fields=[
        FieldConfig(name="name"),
        FieldConfig(name="meta", tokenizer="json")])
    with pytest.raises(ValueError,
                       match="`meta` cannot be used in `partition_by` "
                             "because it is a multi-valued field"):
        schema.partition_fields(d.schema)


def test_aliased_array_expression_errors(spark):
    d = spark.createDataFrame([(1, [1, 2], "x")],
                              "id long, int_array array<int>, name string")
    schema = _schema("aliased_array", fields=[
        FieldConfig(name="aliased_array", source="int_array")])
    with pytest.raises(ValueError,
                       match="`aliased_array` cannot be used in "
                             "`partition_by` because it is a "
                             "multi-valued field"):
        schema.partition_fields(d.schema)


# ============================================================
# Validation fires at build; the saved layout partition-prunes
# ============================================================

def test_build_validates(docs):
    with pytest.raises(ValueError, match="does not exist"):
        build_index(docs, _schema("nope"))


def test_saved_docs_partition_pruning(docs, tmp_path, spark):
    import os
    idx_path = str(tmp_path / "pidx")
    build_and_save(docs, _schema("tenant_id"), idx_path, save_docs=True)
    # hive-style layout on disk
    assert sorted(d for d in os.listdir(f"{idx_path}/docs")
                  if d.startswith("tenant_id=")) == \
        ["tenant_id=1", "tenant_id=2"]
    # an attribute filter on the partition column prunes partitions
    saved = spark.read.parquet(f"{idx_path}/docs")
    plan = (saved.filter(F.col("tenant_id") == 1)
            ._jdf.queryExecution().executedPlan().toString())
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "tenant_id" in pf[0]
    got = sorted(r["name"] for r in
                 saved.filter(F.col("tenant_id") == 1).collect())
    assert got == ["Alice", "Charlie"]
