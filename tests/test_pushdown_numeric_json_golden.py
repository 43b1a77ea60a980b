"""pushdown_numeric.out golden (PUBLIC reference behavior): JSON
numeric multi-type expansion — one JSON path holding I64, U64
(beyond i64::MAX), and F64 values; equality/ranges/IN must compare at
FULL numeric precision:

- cross-type equality: 100 matches both the I64 storage (100) and the
  F64 storage (100.0); same for IN lists,
- u64 territory: u64::MAX, MAX-1, MAX-2 stay distinct,
- 2^53±k boundary integers stay distinct (an f64 comparison collapses
  2^53 and 2^53+1),
- ranges crossing the I64/U64 type boundary are seamless.

Documented divergence (PART 3 / SECTION K2): the reference's
fast-field RANGE path stores every value as F64 when the column mixes
ints and floats, so its own K2 test pins 2^53 and 2^53+1 as EQUAL
("precision loss" per the reference's comment).  This engine's columnar
value is the raw JSON token, so ranges keep exact-integer semantics —
the same answer the reference's own term-dictionary path (PART 2
SECTIONS B-F, ported below) and PostgreSQL NUMERIC give.  We pin the
exact behavior, not the storage artifact.

Ref: pg_search/tests/pg_regress/expected/pushdown_numeric.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

VALUES = [
    "-9223372036854775808", "-1000", "-42", "-1", "0", "1", "42", "1000",
    "9223372036854775807",
    "9223372036854775808", "10000000000000000000", "18446744073709551613",
    "18446744073709551614", "18446744073709551615",
    "-42.5", "-3.14159", "0.5", "3.14159", "42.5",
    "100", "100.0", "999", "999.0",
    "-9007199254740992", "-9007199254740991", "9007199254740991",
    "9007199254740992", "9007199254740993", "9007199254740994",
    "9007199254740995",
    "50", "99", "99.5", "100.5", "101", "150", "200",
]


@pytest.fixture(scope="module")
def json_numeric(spark):
    rows = [(i + 1, '{"num": %s}' % v) for i, v in enumerate(VALUES)]
    docs = spark.createDataFrame(rows, "id int, data string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="data", tokenizer="json")]))
    return idx


def _ids(idx, q):
    return sorted(r["doc_id"]
                  for r in compile_query(idx, q).select("doc_id").collect())


# --- SECTION A: equality ------------------------------------------------

def test_a1_only_i64(json_numeric):
    assert _ids(json_numeric, ast.Term("data.num", -42)) == [3]


def test_a2_only_u64(json_numeric):
    assert _ids(json_numeric,
                ast.Term("data.num", 9223372036854775808)) == [10]


def test_a3_only_f64(json_numeric):
    assert _ids(json_numeric, ast.Term("data.num", 3.14159)) == [18]


def test_a4_cross_type_int_needle(json_numeric):
    """100 matches BOTH 100 (I64) and 100.0 (F64)."""
    assert _ids(json_numeric, ast.Term("data.num", 100)) == [20, 21]


def test_a5_cross_type_float_needle(json_numeric):
    assert _ids(json_numeric, ast.Term("data.num", 999.0)) == [22, 23]


def test_u64_max_neighbors_distinct(json_numeric):
    assert _ids(json_numeric,
                ast.Term("data.num", 18446744073709551615)) == [14]
    assert _ids(json_numeric,
                ast.Term("data.num", 18446744073709551614)) == [13]


def test_2_53_boundary_distinct(json_numeric):
    assert _ids(json_numeric, ast.Term("data.num", 9007199254740992)) == [27]
    assert _ids(json_numeric, ast.Term("data.num", 9007199254740993)) == [28]


# --- SECTIONS B-E: open ranges -------------------------------------------

def test_b1_gt_i64(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", lower=1000,
                                        lower_inclusive=False)) == \
        [9, 10, 11, 12, 13, 14, 26, 27, 28, 29, 30]


def test_b2_gt_u64_boundary(json_numeric):
    assert _ids(json_numeric, ast.Range(
        "data.num", lower=18446744073709551613,
        lower_inclusive=False)) == [13, 14]


def test_b3_gt_f64(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", lower=3.0,
                                        lower_inclusive=False)) == \
        [7, 8, 9, 10, 11, 12, 13, 14, 18, 19, 20, 21, 22, 23,
         26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37]


def test_b4_gt_negative(json_numeric):
    got = _ids(json_numeric, ast.Range("data.num", lower=-100,
                                       lower_inclusive=False))
    assert got == [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                   18, 19, 20, 21, 22, 23, 26, 27, 28, 29, 30, 31, 32,
                   33, 34, 35, 36, 37]


def test_c2_lt_i64_max_plus_one(json_numeric):
    """< i64::MAX+1 excludes all U64-territory values, 32 rows."""
    got = _ids(json_numeric, ast.Range("data.num",
                                       upper=9223372036854775808,
                                       upper_inclusive=False))
    assert len(got) == 32
    assert set(got) == set(range(1, 38)) - {10, 11, 12, 13, 14}


def test_d1_ge_u64(json_numeric):
    assert _ids(json_numeric, ast.Range(
        "data.num", lower=18446744073709551614)) == [13, 14]


def test_e1_le_one(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", upper=1)) == \
        [1, 2, 3, 4, 5, 6, 15, 16, 17, 24, 25]


def test_e3_le_zero(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", upper=0)) == \
        [1, 2, 3, 4, 5, 15, 16, 24, 25]


# --- SECTION F: BETWEEN ---------------------------------------------------

def test_f1_between_0_100(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", lower=0, upper=100)) \
        == [5, 6, 7, 17, 18, 19, 20, 21, 31, 32, 33]


def test_f2_between_crossing_i64_u64(json_numeric):
    assert _ids(json_numeric, ast.Range(
        "data.num", lower=9223372036854775807,
        upper=9223372036854775808)) == [9, 10]


def test_f3_between_u64(json_numeric):
    assert _ids(json_numeric, ast.Range(
        "data.num", lower=18446744073709551613,
        upper=18446744073709551615)) == [12, 13, 14]


def test_f5_between_crossing_zero(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", lower=-10, upper=10)) \
        == [4, 5, 6, 16, 17, 18]


def test_f6_between_cross_type(json_numeric):
    assert _ids(json_numeric, ast.Range("data.num", lower=99, upper=101)) \
        == [20, 21, 32, 33, 34, 35]


# --- SECTION G: IN (TermSet) ----------------------------------------------

def test_g1_in_i64(json_numeric):
    assert _ids(json_numeric, ast.TermSet("data.num", [-42, -1, 42])) == \
        [3, 4, 7]


def test_g2_in_u64(json_numeric):
    assert _ids(json_numeric, ast.TermSet(
        "data.num", [9223372036854775808, 18446744073709551615])) == \
        [10, 14]


def test_g3_in_f64(json_numeric):
    assert _ids(json_numeric, ast.TermSet(
        "data.num", [0.5, 3.14159, 42.5])) == [17, 18, 19]


def test_g5_in_cross_type(json_numeric):
    """IN (100, 999) matches the I64 AND F64 storages of both."""
    assert _ids(json_numeric, ast.TermSet("data.num", [100, 999])) == \
        [20, 21, 22, 23]
