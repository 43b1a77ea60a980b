"""columnar_basic_01..05 goldens (PUBLIC reference behavior, tables
replicated inline): the reference's ColumnarExecState serves any mix of
fast numeric / fast string / UUID columns straight from index storage.
Spark analog: ``search(columns=[...])`` projects display columns
through the docs store and Catalyst prunes the parquet scan to exactly
the requested fast columns (the "Fast Fields:" list in the reference
plans) — asserted here on a saved index via ReadSchema.

Ref: pg_search/tests/pg_regress/expected/columnar_basic_01_basic_mixed_fields.out
     .._02_multiple_string_fields.out  .._03_multiple_numeric_fields.out
     .._04_mixed_field_types.out       .._05_uuid.out
"""

import re

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.index import SearchIndex, build_and_save
from sparksearch.query.search import search

ROWS = [
    ("mix1", 100, 10000, "Apple", "Red", "Fruit", "This is a red apple"),
    ("mix2", 200, 20000, "Banana", "Yellow", "Fruit",
     "This is a yellow banana"),
    ("mix3", 300, 30000, "Carrot", "Orange", "Vegetable",
     "This is an orange carrot"),
    ("mix4", 400, 40000, "Donut", "Brown", "Dessert",
     "This is a chocolate donut"),
    ("mix5", 500, 50000, "Egg", "White", "Protein", "This is a white egg"),
]
DDL = ("id string, numeric_field1 int, numeric_field2 long, "
       "string_field1 string, string_field2 string, string_field3 string, "
       "content string")


def _schema():
    return IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="string_field1"),
                     FieldConfig(name="string_field2"),
                     FieldConfig(name="string_field3"),
                     FieldConfig(name="content")])


@pytest.fixture(scope="module")
def mixed(spark):
    docs = spark.createDataFrame(ROWS, DDL)
    return build_index(docs, _schema())


def test_basic_mixed_fields(mixed):
    """columnar_basic_01: numeric + string fast fields in one query."""
    got = search(mixed, "content:red", with_score=False,
                 columns=["numeric_field1", "numeric_field2",
                          "string_field1", "string_field2"]).collect()
    assert [tuple(r) for r in got] == [(100, 10000, "Apple", "Red")]


def test_multiple_string_fast_fields(mixed):
    """columnar_basic_02: three string fast fields, ORDER BY id."""
    got = search(mixed, "content:red", with_score=False,
                 order_by=[("id", "asc")],
                 columns=["string_field1", "string_field2",
                          "string_field3"]).collect()
    assert [tuple(r) for r in got] == [("Apple", "Red", "Fruit")]


def test_multiple_numeric_fast_fields(mixed):
    """columnar_basic_03: numeric-only projection, ORDER BY id."""
    got = search(mixed, "content:red", with_score=False,
                 order_by=[("id", "asc")],
                 columns=["numeric_field1", "numeric_field2"]).collect()
    assert [tuple(r) for r in got] == [(100, 10000)]


def test_mixed_field_types_interleaved(mixed):
    """columnar_basic_04: interleaved numeric/string select list keeps
    the caller's column order."""
    got = search(mixed, "content:red", with_score=False,
                 order_by=[("id", "asc")],
                 columns=["numeric_field1", "string_field1",
                          "numeric_field2", "string_field2"]).collect()
    assert [tuple(r) for r in got] == [(100, "Apple", 10000, "Red")]


def test_columnar_projection_prunes_doc_scan(spark, tmp_path_factory):
    """The reference plan pins ``Fast Fields: numeric_field1,
    numeric_field2, string_field1, string_field2`` — only those columns
    are decoded.  Spark analog: on a saved index the docs-parquet
    ReadSchema must contain exactly the requested columns + key, and
    never ``content`` (the non-fast source text)."""
    path = str(tmp_path_factory.mktemp("colbasic") / "idx")
    docs = spark.createDataFrame(ROWS, DDL)
    build_and_save(docs, _schema(), path, save_docs=True)
    idx = SearchIndex.load(spark, path, _schema())
    out = search(idx, "content:red", with_score=False,
                 columns=["numeric_field1", "numeric_field2",
                          "string_field1", "string_field2"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    docs_reads = [s for s in read_schemas
                  if "numeric_field1" in s or "string_field1" in s]
    assert docs_reads, plan
    for s in docs_reads:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert "content" not in cols, plan
        assert "string_field3" not in cols, plan


def test_uuid_fast_fields(spark):
    """columnar_basic_05: UUID key field and non-key UUID field are
    both fast — ORDER BY either serves from index storage; name matches
    return both 'bob' rows."""
    rows = [
        ("0b9a8f3e-0000-4000-8000-000000000001",
         "9f000000-0000-4000-8000-00000000000a", "alice"),
        ("0b9a8f3e-0000-4000-8000-000000000002",
         "9f000000-0000-4000-8000-000000000009", "bob"),
        ("0b9a8f3e-0000-4000-8000-000000000003",
         "9f000000-0000-4000-8000-000000000008", "bob"),
        ("0b9a8f3e-0000-4000-8000-000000000004",
         "9f000000-0000-4000-8000-000000000007", "cloe"),
        ("0b9a8f3e-0000-4000-8000-000000000005",
         "9f000000-0000-4000-8000-000000000006", "sally"),
    ]
    docs = spark.createDataFrame(
        rows, "uuid_key string, uuid string, name string")
    idx = build_index(docs, IndexSchema(
        key_field="uuid_key",
        text_fields=[FieldConfig(name="uuid", tokenizer="keyword"),
                     FieldConfig(name="name", tokenizer="keyword")]))
    by_key = search(idx, "name:bob", with_score=False,
                    order_by=[("uuid_key", "asc")],
                    columns=["name"]).collect()
    assert [r[0] for r in by_key] == ["bob", "bob"]
    by_uuid = search(idx, "name:bob", with_score=False,
                     order_by=[("uuid", "asc")],
                     columns=["name"]).collect()
    assert [r[0] for r in by_uuid] == ["bob", "bob"]
