"""columnar_edgecases_01..05 goldens (PUBLIC reference behavior, tables
replicated inline): corner-case values served through fast-field
columnar projections — empty strings, 8k strings, specials/CJK,
i64 extremes, DBL_MAX floats, booleans, NULLs in both string and
numeric fast fields, and the normal-vs-columnar execution-method
result-identity bug corpus (05).

Ref: pg_search/tests/pg_regress/expected/columnar_edgecases_01_corner_cases.out
     .._02_null_handling.out        .._03_string_edge_cases.out
     .._04_complex_string_patterns.out  .._05_numeric_handling.out
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import parse_query
from sparksearch.query.search import search

I64_MAX = 9223372036854775807
I64_MIN = -9223372036854775808
DBL_MAX = 1.7976931348623157e308

CORNER_ROWS = [
    ("case1", "", "a" * 8000, '!@#$%^&*()_+{}[]|:;"\'<>,.?/',
     I64_MAX, I64_MIN, DBL_MAX, 0, -2147483648, True,
     "Contains test term"),
    ("case2", "", "b" * 2, "-_.+", 0, 0, 0.0, 0, 0, False,
     "Contains test term"),
    ("case3", "not_empty", "", "漢字", 42, -42, 3.14159, 0, -1, True,
     "Contains test term"),
    ("complex1", "pattern with spaces", "line1\nline2\nline3",
     "tab\ttab", 1, 1, 1.0, 1, 1, True, "complex pattern test"),
    # standard_conforming_strings: the reference's 'backslash\\test'
    # is two literal backslashes
    ("complex2", 'quotation "marks"', "backslash\\\\test", "percent%test",
     2, 2, 2.0, 2, 2, False, "complex pattern test"),
]
CORNER_DDL = ("id string, empty_string string, very_long_string string, "
              "special_chars string, extreme_large long, extreme_small long, "
              "float_value double, zero_value int, negative_value int, "
              "bool_field boolean, content string")


@pytest.fixture(scope="module")
def corner(spark):
    docs = spark.createDataFrame(CORNER_ROWS, CORNER_DDL)
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="empty_string"),
                     FieldConfig(name="very_long_string"),
                     FieldConfig(name="special_chars"),
                     FieldConfig(name="content")]))


def _rows(idx, qs, cols):
    return [tuple(r) for r in
            search(idx, qs, with_score=False, order_by=[("id", "asc")],
                   columns=cols).collect()]


def test_empty_strings(corner):
    assert _rows(corner, "content:test", ["id", "empty_string"]) == [
        ("case1", ""), ("case2", ""), ("case3", "not_empty"),
        ("complex1", "pattern with spaces"),
        ("complex2", 'quotation "marks"')]


def test_very_long_strings(corner):
    got = search(corner, "content:test", with_score=False,
                 order_by=[("id", "asc")], columns=["id"]) \
        .join(corner.docs.select("id", F.length("very_long_string")
                                 .alias("long_string_length")), "id") \
        .orderBy("id").collect()
    assert [tuple(r) for r in got] == [
        ("case1", 8000), ("case2", 2), ("case3", 0),
        ("complex1", 17), ("complex2", 15)]


def test_special_characters(corner):
    assert _rows(corner, "content:test", ["id", "special_chars"]) == [
        ("case1", '!@#$%^&*()_+{}[]|:;"\'<>,.?/'), ("case2", "-_.+"),
        ("case3", "漢字"), ("complex1", "tab\ttab"),
        ("complex2", "percent%test")]


def test_extreme_numeric_values(corner):
    assert _rows(corner, "content:test",
                 ["id", "extreme_large", "extreme_small"]) == [
        ("case1", I64_MAX, I64_MIN), ("case2", 0, 0),
        ("case3", 42, -42), ("complex1", 1, 1), ("complex2", 2, 2)]


def test_boolean_values(corner):
    assert _rows(corner, "content:test", ["id", "bool_field"]) == [
        ("case1", True), ("case2", False), ("case3", True),
        ("complex1", True), ("complex2", False)]


def test_complex_string_patterns(corner):
    """columnar_edgecases_04: multi-term parse over the complex rows."""
    assert _rows(corner, "content:(complex pattern)",
                 ["id", "empty_string", "special_chars"]) == [
        ("complex1", "pattern with spaces", "tab\ttab"),
        ("complex2", 'quotation "marks"', "percent%test")]


def test_null_handling(spark):
    """columnar_edgecases_02: NULL string + numeric fast fields survive
    the round trip; the NULL-text row still matches on content."""
    docs = spark.createDataFrame(
        [("null1", None, None, "null test case"),
         ("null2", "not null", 42, "null test case")],
        "id string, string_field string, numeric_field int, content string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="string_field"),
                     FieldConfig(name="content")]))
    got = _rows(idx, "content:null", ["id", "string_field", "numeric_field"])
    assert got == [("null1", None, None), ("null2", "not null", 42)]


def test_string_edge_cases(spark):
    """columnar_edgecases_03: empty / special-char / repeated long
    string fast-field values through a two-term disjunctive parse."""
    docs = spark.createDataFrame(
        [("edge1", 1, 1, "", "empty_first", "test", "edge case test"),
         ("edge2", 2, 2, "special_chars_!@#$%^&*()", "test", "test",
          "edge case test"),
         ("edge3", 3, 3, "very_long_string_" * 10, "test", "test",
          "edge case test")],
        "id string, numeric_field1 int, numeric_field2 long, "
        "string_field1 string, string_field2 string, string_field3 string, "
        "content string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="string_field1"),
                     FieldConfig(name="string_field2"),
                     FieldConfig(name="string_field3"),
                     FieldConfig(name="content")]))
    got = _rows(idx, "content:(edge case)",
                ["id", "string_field1", "string_field2"])
    assert got == [("edge1", "", "empty_first"),
                   ("edge2", "special_chars_!@#$%^&*()", "test"),
                   ("edge3", "very_long_string_" * 10, "test")]


GREEK = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
         "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi",
         "omega"]
COLORS = ["red", "orange", "yellow", "green", "blue", "indigo",
          "violet", "black", "white", "gray"]
NUMERIC_EXPECTED = [
    (3, 3.0, Decimal("3.00")), (4, 4.0, Decimal("4.00")),
    (24, 24.0, Decimal("24.00")), (50, 50.0, Decimal("50.00")),
    (73, 73.0, Decimal("73.00")), (74, 74.0, Decimal("74.00")),
    (100, 0.0, Decimal("100.00"))]


def test_numeric_handling_exec_method_identity(spark):
    """columnar_edgecases_05: the same two-IN-set query must return the
    identical numeric rows (int / float / NUMERIC(10,2)) through both
    execution shapes — here the heap-join row path vs the pruned
    columnar projection path."""
    rows = [(i, GREEK[i % 24], COLORS[i % 10], i % 1000,
             float(i % 100), Decimal(i % 10000).quantize(Decimal("0.01")))
            for i in range(1, 101)]
    docs = spark.createDataFrame(
        rows, "id long, string_field1 string, string_field2 string, "
              "numeric_field1 int, numeric_field2 double, "
              "numeric_field3 decimal(10,2)")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="string_field1", tokenizer="keyword"),
                     FieldConfig(name="string_field2",
                                 tokenizer="keyword")]))
    q = ast.Boolean(must=[
        parse_query("IN [alpha beta gamma delta epsilon]",
                    default_field="string_field1", index_schema=idx.schema),
        parse_query("IN [red blue green]",
                    default_field="string_field2", index_schema=idx.schema)])
    # columnar projection path
    col_rows = [tuple(r) for r in search(
        idx, q, with_score=False,
        order_by=[("numeric_field1", "asc")],
        columns=["numeric_field1", "numeric_field2",
                 "numeric_field3"]).collect()]
    assert col_rows == NUMERIC_EXPECTED
    # normal (row) path: full-width heap join, then project
    m = compile_query(idx, q).select("doc_id")
    normal = (idx.docs.join(m, idx.docs["id"] == m["doc_id"], "left_semi")
              .orderBy("numeric_field1")
              .select("numeric_field1", "numeric_field2", "numeric_field3")
              .collect())
    assert [tuple(r) for r in normal] == NUMERIC_EXPECTED
