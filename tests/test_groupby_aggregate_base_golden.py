"""groupby_aggregate.out golden (PUBLIC reference behavior, tables
replicated inline): the base GROUP BY + aggregate-custom-scan family —
single/multi-column GROUP BY with COUNT/SUM/AVG/MIN/MAX, select-list
column order preserved, empty-match empty groups, contradictory /
tautological NOT compositions, mixed data types, the DISTINCT
no-pushdown warning, compound search + attribute predicates, ORDER BY
on aggregate expressions and their aliases (incl. bare-aggregate
projections), and GROUP BY columns absent from the select list.

Ref: pg_search/tests/pg_regress/expected/groupby_aggregate.out
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import sql_aggregate_spec
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

PRODUCTS = [
    (1, "Laptop with fast processor", 5, "Electronics", 999.99, True),
    (2, "Gaming laptop with RGB", 5, "Electronics", 1299.99, True),
    (3, "Toy laptop for kids", 3, "Toys", 499.99, False),
    (4, "Wireless keyboard and mouse", 4, "Electronics", 79.99, True),
    (5, "Mechanical keyboard RGB", 5, "Electronics", 149.99, True),
    (6, "Running shoes for athletes", 5, "Sports", 89.99, True),
    (7, "Winter jacket warm", 4, "Clothing", 129.99, True),
    (8, "Summer jacket light", 3, "Clothing", 59.99, True),
]


@pytest.fixture(scope="module")
def prods(spark):
    docs = spark.createDataFrame(
        PRODUCTS, "id int, description string, rating int, "
                  "category string, price double, in_stock boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category", fast=True)],
        numeric_fields=[{"name": "rating", "fast": True},
                        {"name": "price", "fast": True}]))
    idx.table_name = "products"
    return docs, idx


def _matched(prods, query):
    docs, idx = prods
    if isinstance(query, str):
        query = ast.Parse(query, field="description")
    m = compile_query(idx, query).select(F.col("doc_id").alias("k"))
    return docs.join(m, docs.id == F.col("k"))


LK = "laptop OR keyboard"


# --- SECTION 1: GROUP BY with aggregate functions ------------------------------

def test_groupby_count(prods):
    got = (_matched(prods, LK).groupBy("category").count()
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [("Electronics", 4), ("Toys", 1)]


def test_groupby_sum_avg_min_max(prods):
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.count("*"), F.sum("price"), F.avg("price"),
                F.min("price"), F.max("price"))
           .orderBy("category").collect())
    assert [(r[0], r[1], pytest.approx(r[2]), pytest.approx(r[3]),
             r[4], r[5]) for r in got] == [
        ("Electronics", 4, pytest.approx(2529.96), pytest.approx(632.49),
         79.99, 1299.99),
        ("Toys", 1, pytest.approx(499.99), pytest.approx(499.99),
         499.99, 499.99)]


def test_groupby_numeric_column(prods):
    got = (_matched(prods, "laptop").groupBy("rating")
           .agg(F.count("*"), F.sum("price"), F.avg("price"))
           .orderBy("rating").collect())
    assert [(r[0], r[1], pytest.approx(r[2]), pytest.approx(r[3]))
            for r in got] == [
        (3, 1, pytest.approx(499.99), pytest.approx(499.99)),
        (5, 2, pytest.approx(2299.98), pytest.approx(1149.99))]


def test_groupby_two_columns(prods):
    got = (_matched(prods, LK).groupBy("category", "rating")
           .agg(F.count("*"), F.avg("price"))
           .orderBy("category", "rating").collect())
    assert [(r[0], r[1], r[2], pytest.approx(r[3])) for r in got] == [
        ("Electronics", 4, 1, pytest.approx(79.99)),
        ("Electronics", 5, 3, pytest.approx(816.6566666666668)),
        ("Toys", 3, 1, pytest.approx(499.99))]


def test_select_list_order_preserved(prods):
    # SELECT COUNT(*), category, AVG(price), rating, SUM(price)
    got = (_matched(prods, LK).groupBy("category", "rating")
           .agg(F.count("*").alias("c"), F.avg("price").alias("a"),
                F.sum("price").alias("s"))
           .select("c", "category", "a", "rating", "s")
           .orderBy("category", "rating").collect())
    assert [(r.c, r.category, pytest.approx(r.a), r.rating,
             pytest.approx(r.s)) for r in got] == [
        (1, "Electronics", pytest.approx(79.99), 4,
         pytest.approx(79.99)),
        (3, "Electronics", pytest.approx(816.6566666666668), 5,
         pytest.approx(2449.9700000000003)),
        (1, "Toys", pytest.approx(499.99), 3, pytest.approx(499.99))]


# --- SECTION 3: edge cases -----------------------------------------------------

def test_empty_match_empty_groups(prods):
    got = (_matched(prods, "nonexistent").groupBy("category")
           .agg(F.count("*"), F.sum("price"), F.avg("price")).collect())
    assert got == []


def test_contradictory_not_and(prods):
    # (NOT laptop) AND laptop → empty
    q = ast.Boolean(
        must=[ast.Parse("laptop", field="description")],
        must_not=[ast.Parse("laptop", field="description")])
    got = _matched(prods, q).groupBy("category").count().collect()
    assert got == []


def test_tautological_not_or(prods):
    # (NOT laptop) OR laptop → every product
    q = ast.Boolean(should=[
        ast.Boolean(must=[ast.All()],
                    must_not=[ast.Parse("laptop", field="description")]),
        ast.Parse("laptop", field="description")])
    got = (_matched(prods, q).groupBy("category")
           .agg(F.count("*"), F.sum("price"), F.avg("rating"))
           .orderBy("category").collect())
    assert [(r[0], r[1], pytest.approx(r[2]), pytest.approx(r[3]))
            for r in got] == [
        ("Clothing", 2, pytest.approx(189.98000000000002),
         pytest.approx(3.5)),
        ("Electronics", 4, pytest.approx(2529.96), pytest.approx(4.75)),
        ("Sports", 1, pytest.approx(89.99), pytest.approx(5.0)),
        ("Toys", 1, pytest.approx(499.99), pytest.approx(3.0))]


# --- SECTION 4: different data types --------------------------------------------

def test_groupby_mixed_types(spark):
    type_test = spark.createDataFrame(
        [(1, 100, 1000000, 10, 99.99, 1.5, 111.11, "test1"),
         (2, 200, 2000000, 20, 199.99, 2.5, 222.22, "test2"),
         (3, 300, 3000000, 30, 299.99, 3.5, 333.33, "test3")],
        "id int, int_val int, bigint_val long, smallint_val short, "
        "numeric_val double, float_val float, double_val double, "
        "text_val string")
    idx = build_index(type_test, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="text_val", fast=True)]))
    m = compile_query(idx, ast.Parse("test1 OR test2 OR test3",
                                     field="text_val")) \
        .select(F.col("doc_id").alias("k"))
    got = (type_test.join(m, type_test.id == F.col("k"))
           .groupBy("text_val")
           .agg(F.sum("int_val"), F.avg("numeric_val"),
                F.min("float_val"), F.max("bigint_val"))
           .orderBy("text_val").collect())
    assert [(r[0], r[1], pytest.approx(r[2]), pytest.approx(r[3]), r[4])
            for r in got] == [
        ("test1", 100, pytest.approx(99.99), pytest.approx(1.5),
         1000000),
        ("test2", 200, pytest.approx(199.99), pytest.approx(2.5),
         2000000),
        ("test3", 300, pytest.approx(299.99), pytest.approx(3.5),
         3000000)]


# --- SECTION 5: DISTINCT falls back with the reference warning -------------------

def test_count_distinct_warns_and_falls_back(prods):
    docs, idx = prods
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        spec = sql_aggregate_spec(idx, "count", "rating", distinct=True)
    assert spec is None
    msgs = [str(x.message) for x in w]
    assert any(m == (
        "Aggregate Scan not used: DISTINCT is not supported (see "
        "https://github.com/paradedb/paradedb/issues/new/choose). "
        "To disable this warning: SET paradedb.check_aggregate_scan = "
        "false (table: products)") for m in msgs), msgs
    # fallback plan returns the same rows
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.countDistinct("rating"), F.sum("price"))
           .orderBy("category").collect())
    assert [(r[0], r[1], pytest.approx(r[2])) for r in got] == [
        ("Electronics", 2, pytest.approx(2529.96)),
        ("Toys", 1, pytest.approx(499.99))]


# --- SECTIONS 6-7: compound predicates + search on other fields -----------------

def test_search_on_keyword_category(prods):
    got = (_matched(prods, ast.Parse("Electronics", field="category"))
           .groupBy("category")
           .agg(F.min("rating"), F.max("rating"), F.sum("price"))
           .orderBy("category").collect())
    assert [(r[0], r[1], r[2], pytest.approx(r[3])) for r in got] == [
        ("Electronics", 4, 5, pytest.approx(2529.96))]


def test_compound_search_and_attribute_or(prods):
    docs, idx = prods
    lk = compile_query(idx, ast.Parse(LK, field="description")) \
        .select(F.col("doc_id").alias("k1"))
    cat = compile_query(idx, ast.Parse("Electronics", field="category")) \
        .select(F.col("doc_id").alias("k2"))
    j = (docs.join(lk, docs.id == F.col("k1"))
         .join(cat, docs.id == F.col("k2"), "left")
         .filter((F.col("rating") >= 4) | F.col("k2").isNotNull()))
    got = (j.groupBy("rating").agg(F.sum("price"), F.count("*"))
           .orderBy("rating").collect())
    assert [(r[0], pytest.approx(r[1]), r[2]) for r in got] == [
        (4, pytest.approx(79.99), 1),
        (5, pytest.approx(2449.9700000000003), 3)]


def test_double_negation(prods):
    # NOT (NOT Electronics) AND (laptop OR keyboard)
    q = ast.Boolean(must=[ast.Parse("Electronics", field="category"),
                          ast.Parse(LK, field="description")])
    got = (_matched(prods, q).groupBy("category")
           .agg(F.avg("price"), F.min("rating"), F.max("rating"))
           .orderBy("category").collect())
    assert [(r[0], pytest.approx(r[1]), r[2], r[3]) for r in got] == [
        ("Electronics", pytest.approx(632.49), 4, 5)]


# --- SECTION 8: ORDER BY aggregate functions -------------------------------------

def test_order_by_count_desc(prods):
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.count("*").alias("c"))
           .orderBy(F.col("c").desc(), F.col("category").asc())
           .select("category").limit(10).collect())
    assert [r.category for r in got] == ["Electronics", "Toys"]


def test_order_by_sum_desc(prods):
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.sum("price").alias("total_price"))
           .orderBy(F.col("total_price").desc()).collect())
    assert [(r[0], pytest.approx(r[1])) for r in got] == [
        ("Electronics", pytest.approx(2529.96)),
        ("Toys", pytest.approx(499.99))]


def test_order_by_avg_asc(prods):
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.avg("price").alias("avg_price"))
           .orderBy(F.col("avg_price").asc()).collect())
    assert [(r[0], pytest.approx(r[1])) for r in got] == [
        ("Toys", pytest.approx(499.99)),
        ("Electronics", pytest.approx(632.49))]


def test_order_by_min_desc(prods):
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.min("price").alias("mn"), F.max("price").alias("mx"))
           .orderBy(F.col("mn").desc()).collect())
    assert [tuple(r) for r in got] == [
        ("Toys", 499.99, 499.99), ("Electronics", 79.99, 1299.99)]


def test_order_by_count_then_key_with_limit(prods):
    got = (_matched(prods, "laptop OR keyboard OR jacket")
           .groupBy("category").agg(F.count("*").alias("c"))
           .orderBy(F.col("c").desc(), F.col("category").asc())
           .limit(2).collect())
    assert [tuple(r) for r in got] == [("Electronics", 4),
                                       ("Clothing", 2)]


def test_bare_aggregate_projection_ordered(prods):
    # SELECT COUNT(*) as cnt ... GROUP BY category ORDER BY cnt DESC,
    # category — the grouping column is absent from the select list
    got = (_matched(prods, LK).groupBy("category")
           .agg(F.count("*").alias("cnt"))
           .orderBy(F.col("cnt").desc(), F.col("category").asc())
           .select("cnt").collect())
    assert [r.cnt for r in got] == [4, 1]


def test_group_column_only_projection(prods):
    # SELECT category ... GROUP BY category, rating: one row per group
    got = (_matched(prods, LK).groupBy("category", "rating").count()
           .orderBy("category", "rating").select("category").collect())
    assert [r.category for r in got] == ["Electronics", "Electronics",
                                         "Toys"]


def test_count_cast_and_alias_order(prods):
    got = (_matched(prods, "laptop").groupBy(
        F.col("category").alias("label"))
        .agg(F.count("*").cast("int").alias("count"))
        .orderBy(F.col("count").desc()).collect())
    assert [tuple(r) for r in got] == [("Electronics", 2), ("Toys", 1)]
