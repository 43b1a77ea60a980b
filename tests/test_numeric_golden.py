"""NUMERIC(p,s) parity with the reference's pg_regress goldens:

- ``numeric_pushdown.out`` — Numeric64 (p<=18, i64 fixed point) and
  NumericBytes (p>18 / unlimited, sortable bytes) storage routing,
  equality/range/boundary filters, decimal-scaling comparison edge
  cases (test 8.5: 12.3 vs 12.30 vs 1.23).
- ``anynumeric-conversion.out`` — NUMERIC(36,0) values spanning the
  safe-f64 / i64 / u64 / above-u64 thresholds all round-trip exactly.

Reference semantics: pg_search/src/schema/mod.rs:298-319 (storage
routing), mod.rs:503-511 (field_supports_aggregate=false for NUMERIC).
Spark analog: DecimalType is exact to 38 digits and Catalyst pushes
decimal comparisons into the parquet scan, so the golden's filters run
natively; the fixed-point/sortable-bytes twins are verified separately.
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.numeric import (MAX_DECIMAL64_NO_SCALE_PRECISION,
                                 encode_numeric_bytes,
                                 field_supports_aggregate, is_numeric_type,
                                 numeric64_expr, numeric_bytes_expr,
                                 numeric_storage)
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


# --- storage routing (mod.rs:298-319) --------------------------------------

def test_numeric_storage_routing():
    assert numeric_storage(10, 2) == "Numeric64"
    assert numeric_storage(18, 6) == "Numeric64"
    assert numeric_storage(5, 0) == "Numeric64"
    assert numeric_storage(19, 2) == "NumericBytes"   # p > 18
    assert numeric_storage(30, 10) == "NumericBytes"
    assert numeric_storage(None, None) == "NumericBytes"  # unlimited
    assert numeric_storage(10, None) == "NumericBytes"    # no scale
    assert numeric_storage(0, 0) == "NumericBytes"        # p must be > 0
    assert MAX_DECIMAL64_NO_SCALE_PRECISION == 18


# --- PART 1: Numeric64 (numeric_pushdown.out tests 1.1-1.7) -----------------

_N64_ROWS = [
    (1, "100.50", "10", "1.234567"),
    (2, "200.75", "20", "2.345678"),
    (3, "300.00", "30", "3.456789"),
    (4, "400.25", "40", "4.567890"),
    (5, "500.99", "50", "5.678901"),
    (6, "99.99", "5", "0.123456"),
    (7, "1000.00", "100", "10.000000"),
    (8, "0.01", "1", "0.000001"),
    (9, "9999999.99", "999", "999999.999999"),
    (10, "123.45", "15", "1.500000"),
]


def _numeric64_index(spark):
    df = (spark.createDataFrame(_N64_ROWS, "id long, price string,"
                                " quantity string, rate string")
          .select("id",
                  F.col("price").cast("decimal(10,2)").alias("price"),
                  F.col("quantity").cast("decimal(5,0)").alias("quantity"),
                  F.col("rate").cast("decimal(18,6)").alias("rate"),
                  F.lit("x").alias("text")))
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="text")])
    return build_index(df, schema)


def _ids(idx, predicate):
    q = ast.HeapFilter(ast.All(), predicate)
    return [r["doc_id"] for r in
            compile_query(idx, q).orderBy("doc_id").collect()]


def test_numeric64_pushdown_filters(spark):
    idx = _numeric64_index(spark)
    # 1.1 equality on NUMERIC(10,2)
    assert _ids(idx, "price = 100.50") == [1]
    # 1.2 strict range
    assert _ids(idx, "price > 200.00") == [2, 3, 4, 5, 7, 9]
    # 1.3 BETWEEN
    assert _ids(idx, "price BETWEEN 100.00 AND 500.00") == [1, 2, 3, 4, 10]
    # 1.4 integer-like NUMERIC(5,0)
    assert _ids(idx, "quantity = 30") == [3]
    # 1.5 range on NUMERIC(18,6)
    assert _ids(idx, "rate >= 2.0 AND rate <= 5.0") == [2, 3, 4]
    # 1.6 less-than
    assert _ids(idx, "price < 150.00") == [1, 6, 8, 10]
    # 1.7 smallest positive boundary
    assert _ids(idx, "price = 0.01") == [8]


def test_numeric64_fixed_point_twin(spark):
    """The i64 fast-field values are value*10^scale (test 8.5 comments:
    12.34 -> 1234, 123.40 -> 12340, 1.23 -> 123 at scale 2)."""
    df = (spark.createDataFrame(
        [(1, "12.34"), (2, "12.35"), (3, "12.36"), (4, "123.40"),
         (5, "1.23")], "id long, val string")
        .select("id", F.col("val").cast("decimal(5,2)").alias("val")))
    got = dict(df.select("id", numeric64_expr(F.col("val"), 2)
                         .alias("i64")).collect())
    assert got == {1: 1234, 2: 1235, 3: 1236, 4: 12340, 5: 123}


def test_numeric64_decimal_compare_edge_cases(spark):
    """numeric_pushdown.out test 8.5: exact decimal term match, range
    with decimal bounds, and 1.23 never matching 12.3/12.30."""
    df = (spark.createDataFrame(
        [(1, "12.34"), (2, "12.35"), (3, "12.36"), (4, "123.40"),
         (5, "1.23")], "id long, val string")
        .select("id", F.col("val").cast("decimal(5,2)").alias("val"),
                F.lit("x").alias("text")))
    idx = build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="text")]))
    assert _ids(idx, "val = 12.35") == [2]
    assert _ids(idx, "val >= 12.34 AND val <= 12.36") == [1, 2, 3]
    assert _ids(idx, "val = 1.23") == [5]      # not 12.3 / 12.30
    assert _ids(idx, "val = 123.4") == [4]     # 123.40 == 123.4 numerically


# --- PART 2: NumericBytes (numeric_pushdown.out tests 2.1-2.5) --------------

# (id, big_value display, huge_precision) — big_value is UNLIMITED
# NUMERIC (25+ significant digits, beyond DecimalType's 38-digit span
# when both 20 integer and 20 fractional digits must coexist), stored
# like the reference stores it: as a lexicographically-sortable byte
# string, with filters comparing encoded bounds.
_NB_ROWS = [
    (1, "12345678901234567890.12345", "12345678901234567890.1234567890"),
    (2, "99999999999999999999.99999", "99999999999999999999.9999999999"),
    (3, "0.00000000000000000001", "0.0000000001"),
    (4, "1.0", "1.0000000000"),
    (5, "100.5", "100.5000000000"),
    (6, "-12345678901234567890.12345", "-12345678901234567890.1234567890"),
    (7, "-1.0", "-1.0000000000"),
]
_NB_SCALE, _NB_WIDTH = 20, 42


def _nb(value):
    return encode_numeric_bytes(value, scale=_NB_SCALE, width=_NB_WIDTH)


def _numeric_bytes_index(spark):
    rows = [(i, bv, _nb(bv), hp) for i, bv, hp in _NB_ROWS]
    df = (spark.createDataFrame(
        rows, "id long, big_value string, big_value_nb string,"
              " huge_precision string")
        .select("id", "big_value", "big_value_nb",
                F.col("huge_precision").cast("decimal(38,10)")
                .alias("huge_precision"), F.lit("x").alias("text")))
    return build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="text")]))


def test_numeric_bytes_pushdown_filters(spark):
    idx = _numeric_bytes_index(spark)
    # 2.1 equality on unlimited NUMERIC (encoded-term comparison)
    assert _ids(idx, f"big_value_nb = '{_nb('1.0')}'") == [4]
    # 2.2 range: byte order == numeric order
    assert _ids(idx, f"big_value_nb > '{_nb('100.0')}'") == [1, 2, 5]
    # 2.3 equality on NUMERIC(30,10) — native DecimalType(38,10)
    assert _ids(idx, "huge_precision = 1.0000000000") == [4]
    # 2.4 range on NUMERIC(30,10)
    assert _ids(idx, "huge_precision >= 0.0 AND huge_precision <= 200.0") \
        == [3, 4, 5]
    # 2.5 negative values
    assert _ids(idx, f"big_value_nb < '{_nb(0)}'") == [6, 7]


def test_numeric_bytes_encoding_order_property():
    """Sortable-bytes invariant: lexicographic order of the encoding
    equals numeric order — incl. negatives, zero, tiny and huge
    magnitudes (the decimal_bytes contract the reference relies on for
    range pushdown)."""
    vals = [Decimal(s) for s in (
        "-99999999999999999999.9999", "-12345678901234567890.12345",
        "-1.0", "-0.5", "-0.00000000000000000001", "0",
        "0.00000000000000000001", "0.0000000001", "0.5", "1.0", "1.23",
        "12.30", "100.5", "12345678901234567890.12345",
        "99999999999999999999.99999")]
    encoded = [_nb(v) for v in vals]
    assert encoded == sorted(encoded)          # input list is ascending
    # shuffled → re-sorted by encoding recovers numeric order
    import random
    rnd = random.Random(7)
    pairs = list(zip(vals, encoded))
    rnd.shuffle(pairs)
    assert [v for v, _ in sorted(pairs, key=lambda p: p[1])] == vals


def test_numeric_bytes_spark_expr_matches_python_twin(spark):
    """numeric_bytes_expr (JVM codegen, DecimalType-bounded) ==
    encode_numeric_bytes for values inside the 38-digit span."""
    vals = ["-12345678.5", "-1.0", "0", "0.0000000001", "1.0",
            "100.5", "12345678901234567890.123456789"]
    df = (spark.createDataFrame([(v,) for v in vals], "v string")
          .select(F.col("v"),
                  numeric_bytes_expr(F.col("v").cast("decimal(38,10)"),
                                     scale=10).alias("nb")))
    got = {r["v"]: r["nb"] for r in df.collect()}
    for v in vals:
        assert got[v] == encode_numeric_bytes(v, scale=10, width=38), v


# --- aggregate pushdown policy (mod.rs:503-511) ------------------------------

def test_field_supports_aggregate(spark):
    idx = _numeric64_index(spark)
    assert field_supports_aggregate(idx, "price") is False     # NUMERIC
    assert field_supports_aggregate(idx, "quantity") is False
    assert field_supports_aggregate(idx, "id") is True         # I64
    assert field_supports_aggregate(idx, "text") is True
    assert field_supports_aggregate(idx, "nope") is False      # unknown
    from pyspark.sql.types import DecimalType, LongType
    assert is_numeric_type(DecimalType(10, 2))
    assert not is_numeric_type(LongType())


def test_numeric_aggregate_still_computes_exactly(spark):
    """No pushdown ≠ no aggregate: SUM/AVG/MIN/MAX over a decimal field
    run through the row store exactly (anynumeric semantics — decimal
    arithmetic, no float drift)."""
    idx = _numeric64_index(spark)
    row = idx.docs.agg(
        F.sum("price").alias("s"), F.min("price").alias("mn"),
        F.max("price").alias("mx")).collect()[0]
    assert row["s"] == sum(Decimal(p) for _, p, _, _ in _N64_ROWS)
    assert row["mn"] == Decimal("0.01")
    assert row["mx"] == Decimal("9999999.99")


# --- anynumeric-conversion.out: NUMERIC(36,0) threshold values ---------------

_ANY_ROWS = [
    (1, "Safe F64 Max", "9007199254740990"),
    (2, "Safe F64 Min", "-9007199254740989"),
    (3, "Unsafe I64 Upper", "9007199254740991"),
    (4, "Unsafe I64 Lower", "-9007199254740990"),
    (5, "Max I64", "9223372036854775807"),
    (6, "Min I64", "-9223372036854775808"),
    (7, "Min U64", "9223372036854775808"),
    (8, "Max U64", "18446744073709551615"),
    (9, "Above U64", "18446744073709551616"),
]


def test_anynumeric_conversion_roundtrip(spark):
    """anynumeric-conversion.out: every threshold value — safe-f64
    boundary, i64 limits, u64 limits, above u64 — survives indexing and
    pdb.all() retrieval EXACTLY (DecimalType(36,0) is exact; a float
    path would corrupt rows 3-9)."""
    df = (spark.createDataFrame(_ANY_ROWS,
                                "id long, description string, amount string")
          .select("id", "description",
                  F.col("amount").cast("decimal(36,0)").alias("amount")))
    idx = build_index(df, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    got = (compile_query(idx, ast.All())
           .join(idx.docs.select("id", "description", "amount"),
                 F.col("doc_id") == F.col("id"))
           .orderBy("id").select("description", "amount").collect())
    expected = [(d, Decimal(a)) for _, d, a in _ANY_ROWS]
    assert [(r["description"], r["amount"]) for r in got] == expected
