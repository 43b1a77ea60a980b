"""aggregate_join_coverage.out golden (PUBLIC reference behavior):
scalar + grouped aggregates over search-driven joins — SUM/COUNT/AVG/
MIN/MAX across int/bigint/real/smallint columns, join fan-out
multiplicity (an order with 2 matching items counts its quantity
twice), empty-match NULL semantics (COUNT 0, others NULL), FILTER
fallback, and the custom-scan-on/off parity pins.

Ref: pg_search/tests/pg_regress/expected/aggregate_join_coverage.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ORDERS = [
    (1, "Laptop order bulk", "Acme Corp", 10, 9999),
    (2, "Laptop order single", "Acme Corp", 1, 999),
    (3, "Running shoes wholesale", "FitGear", 50, 4499),
    (4, "Jacket order", "OutdoorCo", 5, 649),
    (5, "Tablet order large", "TechShop", 20, 5999),
]
ITEMS = [
    (1, 1, "laptop-15inch", 999), (2, 1, "laptop-charger", 49),
    (3, 2, "laptop-13inch", 999), (4, 3, "shoes-runner", 89),
    (5, 3, "shoes-trail", 99), (6, 4, "jacket-winter", 129),
    (7, 5, "tablet-pro", 299), (8, 5, "tablet-case", 39),
]


@pytest.fixture(scope="module")
def cov(spark):
    orders = spark.createDataFrame(
        ORDERS, "id int, description string, customer string, "
                "quantity int, amount long")
    items = spark.createDataFrame(
        ITEMS, "id int, order_id int, item_name string, unit_price int")
    idx = build_index(orders, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="default"),
                     FieldConfig(name="customer", tokenizer="default")],
        numeric_fields=["quantity", "amount"]))
    return orders, items, idx


def _joined(cov_fix, qstr):
    orders, items, idx = cov_fix
    m = compile_query(idx, ast.Parse(qstr, field="description")) \
        .select("doc_id")
    o = orders.join(m, orders["id"] == m["doc_id"], "left_semi")
    return o.join(items.withColumnRenamed("id", "item_id"),
                  o["id"] == F.col("order_id"))


def test_01_sum_int_and_bigint(cov):
    j = _joined(cov, "laptop")
    r = j.agg(F.sum("quantity").alias("sq"),
              F.sum("amount").alias("sa")).collect()[0]
    assert (r["sq"], r["sa"]) == (21, 20997)


def test_02_count_column(cov):
    assert _joined(cov, "laptop").agg(
        F.count("unit_price")).collect()[0][0] == 3


def test_03_min_max_int(cov):
    r = _joined(cov, "laptop OR shoes").agg(
        F.min("quantity").alias("mn"),
        F.max("quantity").alias("mx")).collect()[0]
    assert (r["mn"], r["mx"]) == (1, 50)
    r = _joined(cov, "laptop").agg(
        F.min("unit_price").alias("mn"),
        F.max("unit_price").alias("mx")).collect()[0]
    assert (r["mn"], r["mx"]) == (49, 999)


def test_04_avg_int(cov):
    r = _joined(cov, "laptop OR shoes").agg(
        F.avg("quantity")).collect()[0][0]
    assert r == pytest.approx(24.2)


def test_05_group_by_text(cov):
    got = (_joined(cov, "laptop OR shoes OR jacket OR tablet")
           .groupBy("customer")
           .agg(F.count("*").alias("count"), F.sum("quantity").alias("sum"))
           .orderBy("customer").collect())
    assert [(r["customer"], r["count"], r["sum"]) for r in got] == [
        ("Acme Corp", 3, 21), ("FitGear", 2, 100),
        ("OutdoorCo", 1, 5), ("TechShop", 2, 40)]


def test_06_empty_join_null_semantics(cov):
    r = _joined(cov, "nonexistent_product_xyz").agg(
        F.count("*").alias("c"), F.sum("quantity").alias("s"),
        F.avg("quantity").alias("a"), F.min("quantity").alias("mn"),
        F.max("quantity").alias("mx")).collect()[0]
    assert tuple(r) == (0, None, None, None, None)


def test_07_mixed_aggregates(cov):
    r = _joined(cov, "laptop OR tablet").agg(
        F.count("*").alias("c1"), F.count("unit_price").alias("c2"),
        F.sum("quantity").alias("s"), F.avg("quantity").alias("a"),
        F.min("unit_price").alias("mn"), F.max("unit_price").alias("mx"),
        F.sum("amount").alias("sa")).collect()[0]
    assert tuple(r)[:3] == (5, 5, 61)
    assert r["a"] == pytest.approx(12.2)
    assert (r["mn"], r["mx"], r["sa"]) == (39, 999, 32995)


def test_08_group_by_with_joined_minmax(cov):
    got = (_joined(cov, "laptop OR shoes OR jacket OR tablet")
           .groupBy("customer")
           .agg(F.count("*").alias("c"), F.sum("quantity").alias("s"),
                F.min("unit_price").alias("mn"),
                F.max("unit_price").alias("mx"))
           .orderBy("customer").collect())
    assert [tuple(r) for r in got] == [
        ("Acme Corp", 3, 21, 49, 999), ("FitGear", 2, 100, 89, 99),
        ("OutdoorCo", 1, 5, 129, 129), ("TechShop", 2, 40, 39, 299)]


def test_09_scalar_parity(cov):
    r = _joined(cov, "laptop OR shoes").agg(
        F.count("*").alias("c"), F.sum("quantity").alias("sq"),
        F.sum("amount").alias("sa"), F.avg("quantity").alias("a")
    ).collect()[0]
    assert tuple(r)[:3] == (5, 121, 29995)
    assert r["a"] == pytest.approx(24.2)


def test_10_filter_clause(cov):
    r = _joined(cov, "laptop OR shoes").agg(
        F.count(F.when(F.col("quantity") > 5, True))).collect()[0][0]
    assert r == 4


@pytest.fixture(scope="module")
def sensors(spark):
    s = spark.createDataFrame(
        [(1, "Temperature sensor high", 98.6, 1),
         (2, "Temperature sensor low", 32.0, 2),
         (3, "Pressure sensor main", 14.7, 1),
         (4, "Humidity sensor room", 55.5, 3)],
        "id int, description string, reading float, priority short")
    logs = spark.createDataFrame(
        [(1, 1, "alert"), (2, 1, "info"), (3, 2, "info"), (4, 3, "alert"),
         (5, 3, "info"), (6, 3, "debug"), (7, 4, "info")],
        "id int, sensor_id int, log_type string")
    idx = build_index(s, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="default")],
        numeric_fields=["reading", "priority"]))
    return s, logs, idx


def _sjoined(sensors_fix, qstr):
    s, logs, idx = sensors_fix
    m = compile_query(idx, ast.Parse(qstr, field="description")) \
        .select("doc_id")
    sm = s.join(m, s["id"] == m["doc_id"], "left_semi")
    return sm.join(logs.withColumnRenamed("id", "log_id"),
                   sm["id"] == F.col("sensor_id"))


def test_11a_real_aggregates(sensors):
    r = _sjoined(sensors, "sensor").agg(
        F.count("*").alias("c"), F.sum("reading").alias("s"),
        F.avg("reading").alias("a"), F.min("reading").alias("mn"),
        F.max("reading").alias("mx")).collect()[0]
    assert r["c"] == 7
    import numpy as np
    assert np.float32(r["s"]) == pytest.approx(328.8, abs=1e-3)
    assert r["a"] == pytest.approx(46.971428571428575, abs=1e-4)
    assert np.float32(r["mn"]) == np.float32(14.7)
    assert np.float32(r["mx"]) == np.float32(98.6)


def test_11b_smallint_aggregates(sensors):
    r = _sjoined(sensors, "sensor").agg(
        F.sum("priority").alias("s"), F.min("priority").alias("mn"),
        F.max("priority").alias("mx")).collect()[0]
    assert tuple(r) == (10, 1, 3)


def test_11c_real_parity(sensors):
    r = _sjoined(sensors, "temperature").agg(
        F.count("*").alias("c"), F.sum("reading").alias("s"),
        F.min("reading").alias("mn"), F.max("reading").alias("mx")
    ).collect()[0]
    assert r["c"] == 3
    import numpy as np
    assert np.float32(r["s"]) == pytest.approx(229.2, abs=1e-3)
    assert np.float32(r["mn"]) == np.float32(32.0)
    assert np.float32(r["mx"]) == np.float32(98.6)


def test_12_bigint_sum_precision(spark):
    big = spark.createDataFrame(
        [(1, "laptop order", 100), (2, "phone order", 200)],
        "id int, description string, qty long")
    tags = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b")], "id int, big_id int, tag string")
    idx = build_index(big, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description", tokenizer="default")],
        numeric_fields=["qty"]))
    m = compile_query(idx, ast.Parse("laptop OR phone",
                                     field="description")).select("doc_id")
    bm = big.join(m, big["id"] == m["doc_id"], "left_semi")
    j = bm.join(tags.withColumnRenamed("id", "tag_id"),
                bm["id"] == F.col("big_id"))
    assert j.agg(F.sum("qty")).collect()[0][0] == 300
