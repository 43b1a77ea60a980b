"""composite.out golden (PUBLIC reference behavior): composite-typed
index expressions — each attribute of a ROW()::type expression becomes
its own searchable field, named after the attribute.

Spark restatement: a struct column's attributes index via expression
sources (``FieldConfig(source="info.name")``) — the DataFrame-native
composite.  Pinned: attribute-targeted parse queries, composites wider
than 32 and at 100 attributes, NULL attribute handling, large values,
and the duplicate-attribute-name rejection.

Ref: pg_search/tests/pg_regress/expected/composite.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import parse_query


def _count(idx, q, default="name"):
    return compile_query(idx, parse_query(q, default, idx.schema)).count()


@pytest.fixture(scope="module")
def products_idx(spark):
    rows = [(1, ("Widget", "A useful widget", 19.99)),
            (2, ("Gadget", "An amazing gadget", 29.99)),
            (3, ("Gizmo", "A fantastic gizmo", 39.99))]
    docs = spark.createDataFrame(
        rows, "id long, info struct<name:string, description:string, "
              "price:double>")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="name", source="info.name"),
            FieldConfig(name="description", source="info.description"),
        ]))
    return idx


def test_search_by_attribute(products_idx):
    assert _count(products_idx, "name:Widget") == 1
    assert _count(products_idx, "description:amazing") == 1
    assert _count(products_idx, "description:widget") == 1


def test_composite_with_100_fields(spark):
    # composites wider than 32 attributes (and at 100) index fine
    names = [f"f{i:03d}" for i in range(1, 101)]
    vals = ["first_field"] + ["filler"] * 48 + ["middle_field"] \
        + ["filler"] * 49 + ["last_field"]
    struct_t = ", ".join(f"{n}:string" for n in names)
    docs = spark.createDataFrame([(1, tuple(vals))],
                                 f"id long, c struct<{struct_t}>")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name=n, source=f"c.{n}")
                     for n in ("f001", "f050", "f100")]))
    assert _count(idx, "f001:first_field", "f001") == 1
    assert _count(idx, "f050:middle_field", "f001") == 1
    assert _count(idx, "f100:last_field", "f001") == 1
    assert _count(idx, "f050:first_field", "f001") == 0


def test_null_composite_attributes(spark):
    rows = [(1, ("Product A", None)), (2, (None, "desc only")),
            (3, ("Product C", "full row"))]
    docs = spark.createDataFrame(
        rows, "id long, info struct<name:string, description:string>")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", source="info.name"),
                     FieldConfig(name="description",
                                 source="info.description")]))
    assert _count(idx, 'name:"Product C"') == 1
    assert _count(idx, "description:desc") == 1
    # NULL attrs simply contribute no terms
    assert _count(idx, "name:product") == 2


def test_large_values_in_composite(spark):
    big = "Large " + ("lorem ipsum dolor " * 6000)  # ~100KB
    docs = spark.createDataFrame(
        [(1, (big,))], "id long, info struct<title:string>")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="title", source="info.title")]))
    assert _count(idx, "title:Large", "title") == 1


def test_duplicate_attribute_names_rejected():
    with pytest.raises(ValueError,
                       match="indexed attribute name defined more than "
                             "once"):
        IndexSchema(key_field="id", text_fields=[
            FieldConfig(name="name", source="a.name"),
            FieldConfig(name="name", source="b.name")])
