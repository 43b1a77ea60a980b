"""join_distinct_expr.out golden (PUBLIC reference behavior, tables
replicated inline; the reference file is its issue #4604 regression):
DISTINCT with expression target lists over a two-sided scored join —
FuncExpr (upper/length), NullTest (IS NULL / IS NOT NULL), OpExpr
arithmetic, COALESCE, cast+concat, every arrow-convertible result type,
and the dedup-before-LIMIT ordering guarantee.  NULL supplier names and
empty-string product names exercise three-valued logic through the
expressions; ordering is byte-order with NULLS LAST (PG C collation ≡
Spark binary UTF-8).

Ref: pg_search/tests/pg_regress/expected/join_distinct_expr.out
"""

import pytest
from pyspark.sql import Window, functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (101, "Wireless Mouse", "Ergonomic wireless mouse with Bluetooth",
     1, "Electronics"),
    (102, "USB Cable", "High-speed USB cable for data wireless transfer",
     2, "Electronics"),
    (103, "Keyboard", "Mechanical keyboard wireless enabled",
     1, "Electronics"),
    (104, None, "Unnamed wireless gadget for testing", 3, "Office"),
    (105, "Headphones", "Noise-canceling wireless headphones premium",
     1, "Electronics"),
    (106, None, "Another unnamed wireless product", 2, "Office"),
    (107, "WIRELESS ROUTER", "Enterprise wireless router",
     1, "Electronics"),
    (108, "tablet", "Budget wireless tablet device", 2, "Electronics"),
    (109, "", "Empty name wireless device", 1, "Office"),
]
SUPPLIERS = [
    (1, "TechCorp", "tech electronics supplier", "USA"),
    (2, None, "unnamed electronics supplier", "UK"),
    (3, "FastParts", "fast delivery of electronics parts", "Germany"),
]


@pytest.fixture(scope="module")
def dex(spark):
    products = spark.createDataFrame(
        PRODUCTS, "id int, name string, description string, "
        "supplier_id int, category string")
    suppliers = spark.createDataFrame(
        SUPPLIERS, "id int, name string, info string, country string")
    p_idx = build_index(products, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="description"),
                                     FieldConfig(name="category")]))
    s_idx = build_index(suppliers, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name"),
                                     FieldConfig(name="info")]))
    pm = compile_query(p_idx, ast.Parse("wireless", field="description")) \
        .select(F.col("doc_id").alias("p_k"))
    sm = compile_query(s_idx, ast.Parse("electronics", field="info")) \
        .select(F.col("doc_id").alias("s_k"))
    j = (products.alias("p")
         .join(suppliers.alias("s"),
               F.col("p.supplier_id") == F.col("s.id"))
         .join(pm, F.col("p.id") == F.col("p_k"), "left_semi")
         .join(sm, F.col("s.id") == F.col("s_k"), "left_semi"))
    return j


def _distinct(j, expr, alias, limit=10):
    got = (j.select(expr.alias(alias), F.col("p.name").alias("name"),
                    F.col("p.id").alias("pid"))
           .withColumn("__rn", F.row_number().over(
               Window.partitionBy(alias, "name").orderBy("pid")))
           .filter(F.col("__rn") == 1)  # DISTINCT keeping min-id tiebreak
           .orderBy(F.col("name").asc_nulls_last(),
                    F.col(alias).asc_nulls_last(), F.col("pid"))
           .limit(limit)
           .select(alias, "name").collect())
    return [(r[alias], r["name"]) for r in got]


NAMES = ["", "Headphones", "Keyboard", "USB Cable", "WIRELESS ROUTER",
         "Wireless Mouse", "tablet", None, None]


def test_1_distinct_upper(dex):
    got = _distinct(dex, F.upper(F.col("s.name")), "upper_supplier")
    assert got == list(zip(
        ["TECHCORP", "TECHCORP", "TECHCORP", None, "TECHCORP",
         "TECHCORP", None, "FASTPARTS", None], NAMES))


def test_2_distinct_is_null(dex):
    got = _distinct(dex, F.col("s.name").isNull(), "supplier_null")
    assert got == list(zip(
        [False, False, False, True, False, False, True, False, True],
        NAMES))


def test_3_distinct_arithmetic(dex):
    got = _distinct(dex, F.col("p.supplier_id") * 10 + F.col("p.id"),
                    "combo_id")
    assert got == list(zip(
        [119, 115, 113, 122, 117, 111, 128, 126, 134], NAMES))


def test_4_distinct_coalesce(dex):
    got = _distinct(dex, F.coalesce(F.col("s.name"), F.lit("N/A")),
                    "safe_supplier")
    assert got == list(zip(
        ["TechCorp", "TechCorp", "TechCorp", "N/A", "TechCorp",
         "TechCorp", "N/A", "FastParts", "N/A"], NAMES))


def test_5_distinct_concat_cast(dex):
    """s.name || '-' || id::text — SQL || is NULL-poisoning, like
    Spark concat()."""
    got = _distinct(dex, F.concat(F.col("s.name"), F.lit("-"),
                                  F.col("p.supplier_id").cast("string")),
                    "name_id")
    assert got == list(zip(
        ["TechCorp-1", "TechCorp-1", "TechCorp-1", None, "TechCorp-1",
         "TechCorp-1", None, "FastParts-3", None], NAMES))


def test_6_distinct_length(dex):
    got = _distinct(dex, F.length(F.col("s.name")), "name_len")
    assert got == list(zip(
        [8, 8, 8, None, 8, 8, None, 9, None], NAMES))


def test_7_dedup_before_limit(dex):
    """LIMIT 1 must return exactly 1 row (dedup happens before LIMIT)."""
    got = _distinct(dex, F.upper(F.col("s.name")).isNull(), "n", limit=1)
    assert got == [(False, "")]


def test_8c_bigint_cast(dex):
    got = _distinct(dex, F.col("p.supplier_id").cast("bigint") * 100,
                    "big_id")
    assert got == list(zip(
        [100, 100, 100, 200, 100, 100, 200, 200, 300], NAMES))


def test_8d_float8_division(dex):
    got = _distinct(dex, F.col("p.supplier_id").cast("double") / 3.0,
                    "ratio")
    third, two3 = 0.3333333333333333, 0.6666666666666666
    assert got == list(zip(
        [third, third, third, two3, third, third, two3, two3, 1.0],
        NAMES))


def test_8a_bool_is_not_null(dex):
    got = _distinct(dex, F.col("s.name").isNotNull(), "has_name")
    assert got == list(zip(
        [True, True, True, False, True, True, False, False, True],
        NAMES))
