"""NULLS FIRST/LAST ordering parity (§2.9).

Ported from the reference's pg_regress expected output
(tests/pg_regress/expected/nulls_ordering.out).  Postgres defaults are
ASC → NULLS LAST, DESC → NULLS FIRST — the OPPOSITE of Spark's `asc()`
default — so the engine's sort path maps directions through
query.search._dir, asserted here against the golden row orders.
"""

from pyspark.sql import functions as F

from sparksearch.index import build_index
from sparksearch.query import ast, search
from sparksearch.schema import IndexSchema, FieldConfig

ROWS = [
    (1, "apple", 10), (2, "banana", 20), (3, None, 30),
    (4, "cherry", None), (5, "date", 50), (6, "elderberry", 60),
    (7, None, None),
]


def _index(spark):
    docs = spark.createDataFrame(ROWS, "id int, text_col string, int_col long")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="text_col")]))
    return idx


def _order(idx, order_by):
    rows = search(idx, ast.All(), order_by=order_by,
                  columns=["id", "text_col", "int_col"]).collect()
    return [r["text_col"] for r in rows]


def test_asc_defaults_nulls_last(spark):
    # nulls_ordering.out Test 1: ASC default places NULLs last
    got = _order(_index(spark), [("text_col", "asc"), ("id", "asc")])
    assert got == ["apple", "banana", "cherry", "date", "elderberry",
                   None, None]


def test_asc_nulls_first_explicit(spark):
    # Test 2: explicit NULLS FIRST
    got = _order(_index(spark), [("text_col", "asc nulls first"),
                                 ("id", "asc")])
    assert got == [None, None, "apple", "banana", "cherry", "date",
                   "elderberry"]


def test_desc_defaults_nulls_first(spark):
    # Test 3: DESC default places NULLs first
    got = _order(_index(spark), [("text_col", "desc"), ("id", "asc")])
    assert got == [None, None, "elderberry", "date", "cherry", "banana",
                   "apple"]


def test_desc_nulls_last_explicit(spark):
    # Test 4: explicit DESC NULLS LAST
    got = _order(_index(spark), [("text_col", "desc nulls last"),
                                 ("id", "asc")])
    assert got == ["elderberry", "date", "cherry", "banana", "apple",
                   None, None]


def test_numeric_grouped_nulls_last(spark):
    # numeric grouped counts, ASC → NULL group last (Tests 5-6 analog)
    df = spark.createDataFrame(ROWS, "id int, text_col string, int_col long")
    g = (df.groupBy("int_col").agg(F.count("*").alias("count"))
         .orderBy(F.col("int_col").asc_nulls_last()))
    got = [(r["int_col"], r["count"]) for r in g.collect()]
    assert got == [(10, 1), (20, 1), (30, 1), (50, 1), (60, 1), (None, 2)]


def test_limit_with_null_sort_key(spark):
    # top-k over a nullable sort column must respect null placement
    idx = _index(spark)
    rows = search(idx, ast.All(), limit=3,
                  order_by=[("int_col", "desc"), ("id", "asc")],
                  columns=["id", "int_col"]).collect()
    # DESC NULLS FIRST: the two null-int docs lead, then 60
    assert [r["id"] for r in rows] == [4, 7, 6]
