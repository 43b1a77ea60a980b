"""columnar_advanced_01_aggregation / 02_mixed_fast_non_fast /
08_type_conversion goldens (PUBLIC reference behavior, tables replicated
inline from common/columnar_advanced_setup.sql): aggregate scans over
search matches, fast/non-fast projection parity, and type-conversion
edge cases (integer extremes, float extremes, booleans, timestamps,
CASE coercions).

Ref: pg_search/tests/pg_regress/expected/columnar_advanced_01_aggregation.out
     .._02_mixed_fast_non_fast.out  .._08_type_conversion.out
     pg_search/tests/pg_regress/common/columnar_advanced_setup.sql
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PAGES = [
    ("page1", "file1", 1, "Page 1 of Invoice PDF with Socienty General details"),
    ("page2", "file1", 2, "Page 2 of Invoice PDF with payment information"),
    ("page3", "file2", 1, "Page 1 of Invoice Receipt with bank details"),
    ("page4", "file3", 1, "Page 1 of Receipt with Socienty General information"),
    ("page5", "file3", 2, "Page 2 of Receipt with transaction ID"),
    ("page6", "file4", 1, "Page 1 of Contract Document with terms and conditions"),
]

MIXED = [
    ("mix1", 100, 10000, "Apple", "Red", "Fruit", "This is a red apple"),
    ("mix2", 200, 20000, "Banana", "Yellow", "Fruit", "This is a yellow banana"),
    ("mix3", 300, 30000, "Carrot", "Orange", "Vegetable", "This is an orange carrot"),
    ("mix4", 400, 40000, "Donut", "Brown", "Dessert", "This is a chocolate donut"),
    ("mix5", 500, 50000, "Egg", "White", "Protein", "This is a white egg"),
    ("unique1", 42, 4242, "Unique Product Z", "Test", "Item",
     "This is a uniqueproductZ for testing mixed fields"),
]

CONVERSION = [
    ("conv1", 32767, 2147483647, 9223372036854775807, 9999999.99,
     3.402e38, 1.7976931348623157e308, True, dt.datetime(1988, 4, 29)),
    ("conv2", -32768, -2147483648, -9223372036854775808, -9999999.99,
     -3.402e38, -1.7976931348623157e308, False, dt.datetime(1999, 12, 31)),
    ("conv3", 0, 0, 0, 0.0, 0.0, 0.0, False, dt.datetime(2000, 1, 1)),
]


@pytest.fixture(scope="module")
def pages(spark):
    docs = spark.createDataFrame(
        PAGES, "id string, fileid string, page_number int, content string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="fileid", tokenizer="keyword"),
                     FieldConfig(name="content")]))
    return docs, idx


@pytest.fixture(scope="module")
def mixed(spark):
    docs = spark.createDataFrame(
        MIXED, "id string, numeric_field1 int, numeric_field2 long, "
        "string_field1 string, string_field2 string, string_field3 string, "
        "content string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="string_field1"),
                     FieldConfig(name="string_field2"),
                     FieldConfig(name="string_field3"),
                     FieldConfig(name="content")]))
    return docs, idx


@pytest.fixture(scope="module")
def conversion(spark):
    docs = spark.createDataFrame(
        CONVERSION,
        "id string, smallint_field short, integer_field int, "
        "bigint_field long, numeric_field double, real_field float, "
        "double_field double, bool_from_int boolean, "
        "timestamp_field timestamp")
    docs = docs.withColumn("content", F.lit("conversion test"))
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    return docs, idx


def _match(docs, idx, q, key="id"):
    m = compile_query(idx, q).select("doc_id")
    return docs.join(m, docs[key] == m["doc_id"], "left_semi")


# --- columnar_advanced_01_aggregation.out ------------------------------------

def test_count_aggregate_over_search(pages):
    """COUNT(*) WHERE content @@@ 'Socienty' → 2 (aggregate scan)."""
    docs, idx = pages
    assert _match(docs, idx, ast.Parse("Socienty", field="content")).count() == 2


def test_metric_aggregates_over_search(pages):
    docs, idx = pages
    got = (_match(docs, idx, ast.Parse("Socienty", field="content"))
           .agg(F.count("*").alias("count"),
                F.avg("page_number").alias("avg_page"),
                F.min("page_number").alias("min_page"),
                F.max("page_number").alias("max_page")).collect()[0])
    assert tuple(got) == (2, 1.0, 1, 1)


def test_aggregate_envelope_over_search(pages):
    """Same aggregate through the pdb.aggregate envelope."""
    _, idx = pages
    env = search_aggregate(idx, ast.Parse("Socienty", field="content"), {
        "c": {"value_count": {"field": "id"}},
        "avg_page": {"avg": {"field": "page_number"}},
        "min_page": {"min": {"field": "page_number"}},
        "max_page": {"max": {"field": "page_number"}}})
    a = env["aggregations"]
    assert a["c"]["value"] == 2.0
    assert a["avg_page"]["value"] == 1.0
    assert a["min_page"]["value"] == 1
    assert a["max_page"]["value"] == 1


# --- columnar_advanced_02_mixed_fast_non_fast.out -----------------------------

def test_fast_field_projection(pages):
    docs, idx = pages
    got = (_match(docs, idx, ast.Parse("Socienty", field="content"))
           .select("fileid", "page_number")
           .orderBy("fileid", "page_number").collect())
    assert [tuple(r) for r in got] == [("file1", 1), ("file3", 1)]


def test_non_fast_field_projection(pages):
    docs, idx = pages
    got = (_match(docs, idx, ast.Parse("Socienty", field="content"))
           .select("content", "id").orderBy("id").collect())
    assert [r["content"] for r in got] == [
        "Page 1 of Invoice PDF with Socienty General details",
        "Page 1 of Receipt with Socienty General information"]


# --- columnar_advanced_08_type_conversion.out ---------------------------------

def test_integer_type_extremes(conversion):
    docs, idx = conversion
    got = (_match(docs, idx, ast.Parse("conversion test", field="content"))
           .select("id", "smallint_field", "integer_field", "bigint_field")
           .orderBy("id").collect())
    assert [tuple(r) for r in got] == [
        ("conv1", 32767, 2147483647, 9223372036854775807),
        ("conv2", -32768, -2147483648, -9223372036854775808),
        ("conv3", 0, 0, 0)]


def test_float_type_extremes(conversion):
    docs, idx = conversion
    got = (_match(docs, idx, ast.Parse("conversion test", field="content"))
           .select("id", "real_field", "double_field").orderBy("id").collect())
    assert got[0]["real_field"] == pytest.approx(3.402e38, rel=1e-6)
    assert got[0]["double_field"] == 1.7976931348623157e308
    assert got[1]["real_field"] == pytest.approx(-3.402e38, rel=1e-6)
    assert got[1]["double_field"] == -1.7976931348623157e308
    assert got[2]["real_field"] == 0.0 and got[2]["double_field"] == 0.0


def test_boolean_and_timestamp_fields(conversion):
    docs, idx = conversion
    m = _match(docs, idx, ast.Parse("conversion test", field="content"))
    got = m.select("id", "bool_from_int", "timestamp_field") \
        .orderBy("id").collect()
    assert [(r["id"], r["bool_from_int"]) for r in got] == [
        ("conv1", True), ("conv2", False), ("conv3", False)]
    assert [r["timestamp_field"] for r in got] == [
        dt.datetime(1988, 4, 29), dt.datetime(1999, 12, 31),
        dt.datetime(2000, 1, 1)]


def test_numeric_string_case_conversion(mixed):
    """CASE WHEN string ~ numeric THEN cast*2 ELSE numeric_field1."""
    docs, idx = mixed
    m = _match(docs, idx, ast.Parse("Unique", field="string_field1"))
    got = m.select(
        "id", "string_field1",
        F.when(F.col("string_field1").rlike("^[0-9]+$"),
               F.col("string_field1").cast("int") * 2)
        .otherwise(F.col("numeric_field1")).alias("converted_value")) \
        .orderBy("id").collect()
    assert [tuple(r) for r in got] == [("unique1", "Unique Product Z", 42)]


def test_string_concat_with_number(mixed):
    docs, idx = mixed
    m = _match(docs, idx, ast.Parse("Apple", field="string_field1")) \
        .filter(F.col("numeric_field1") > 0)
    got = m.select("id", F.concat_ws(
        " - ", "string_field1",
        F.col("numeric_field1").cast("string")).alias("text_with_num")) \
        .collect()
    assert [tuple(r) for r in got] == [("mix1", "Apple - 100")]


def test_date_conversions(conversion):
    docs, idx = conversion
    m = _match(docs, idx, ast.Parse("conversion test", field="content"))
    got = m.select(
        "id",
        F.col("timestamp_field").cast("date").alias("just_date"),
        F.date_format("timestamp_field", "HH:mm:ss").alias("just_time"),
        F.date_format("timestamp_field", "yyyy-MM-dd").alias("fmt")) \
        .orderBy("timestamp_field").limit(2).collect()
    assert [tuple(r) for r in got] == [
        ("conv1", dt.date(1988, 4, 29), "00:00:00", "1988-04-29"),
        ("conv2", dt.date(1999, 12, 31), "00:00:00", "1999-12-31")]


def test_case_bucket_conversion(mixed):
    """CASE over numeric_field1 buckets, ordered, LIMIT 3 — the 'is'
    needle matches every content row."""
    docs, idx = mixed
    m = _match(docs, idx, ast.Parse("is", field="content"))
    cat = (F.when(F.col("numeric_field1") > 300, "High Value")
           .when(F.col("numeric_field1") > 100, "Medium Value")
           .otherwise("Low Value"))
    got = m.select("id", cat.alias("numeric_category"), "string_field1") \
        .orderBy("numeric_field1", "id").limit(3).collect()
    assert [tuple(r) for r in got] == [
        ("unique1", "Low Value", "Unique Product Z"),
        ("mix1", "Low Value", "Apple"),
        ("mix2", "Medium Value", "Banana")]
