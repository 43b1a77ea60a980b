"""aggregate_join.out golden (PUBLIC reference behavior, tables
replicated inline): the base aggregate-over-join regression family —
scalar aggregates through search-driven inner joins, empty-match NULL
semantics, GROUP BY (single / two-column / JSON sub-field), COUNT
DISTINCT both directions, LEFT / RIGHT / FULL OUTER counts, composite
ON clauses, STDDEV/VARIANCE, timestamp and timestamptz MIN/MAX with
mixed source zones, ORDER BY aggregate NULLS FIRST/LAST, cross-table
OR predicates, post-join filters, HAVING, BOOL_AND/OR, STRING_AGG /
ARRAY_AGG (incl. ORDER BY inside the aggregate), and per-aggregate
FILTER clauses.  All pinned values below are the reference's expected
output, byte-derived from the same 5-product / 9-tag corpus.

Ref: pg_search/tests/pg_regress/expected/aggregate_join.out
"""

import datetime
from datetime import timezone, timedelta

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

# base corpus + the NULL-handling orphan (id 6) + the NULLS-order pair
# (9901/9902) — all present throughout, as none matches the other
# sections' needles and inner joins exclude tag-less products anyway
PRODUCTS = [
    (1, "Laptop with fast processor", "Electronics", 999.99, 5, True),
    (2, "Gaming laptop with RGB", "Electronics", 1299.99, 5, True),
    (3, "Running shoes for athletes", "Sports", 89.99, 4, True),
    (4, "Winter jacket warm", "Clothing", 129.99, 3, True),
    (5, "Toy laptop for kids", "Toys", 499.99, 2, False),
    (6, "Orphan product no tags", "Misc", None, None, True),
    (9901, "nullsort test alpha", "NullSortA", 10.00, 1, True),
    (9902, "nullsort test beta", "NullSortB", 20.00, 2, True),
]
TAGS = [
    (1, 1, "tech"), (2, 1, "computer"),
    (3, 2, "tech"), (4, 2, "gaming"),
    (5, 3, "fitness"), (6, 3, "running"),
    (7, 4, "outdoor"),
    (8, 5, "tech"), (9, 5, "kids"),
    (10, 999, "orphan_tag"),
    (11, 9902, "real_tag_1"), (12, 9902, "real_tag_2"),
]


@pytest.fixture(scope="module")
def fx(spark):
    products = spark.createDataFrame(
        PRODUCTS, "id int, description string, category string, "
                  "price double, rating int, in_stock boolean")
    tags = spark.createDataFrame(
        TAGS, "id int, product_id int, tag_name string")
    p_idx = build_index(products, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category", fast=True)],
        numeric_fields=[{"name": "price", "fast": True},
                        {"name": "rating", "fast": True}],
        boolean_fields=[{"name": "in_stock", "fast": True}]))
    t_idx = build_index(tags, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="tag_name", fast=True)],
        numeric_fields=[{"name": "product_id", "fast": True}]))
    return products, tags, p_idx, t_idx


def _join(fx, needle, how="inner"):
    """products ⋈ tags driven by a search over p.description."""
    products, tags, p_idx, _ = fx
    m = compile_query(p_idx, ast.Parse(needle, field="description")) \
        .select(F.col("doc_id").alias("p_k"))
    matched = products.alias("p").join(m, F.col("p.id") == F.col("p_k"))
    return matched.join(tags.alias("t"),
                        F.col("p.id") == F.col("t.product_id"), how)


# --- SECTION 1: scalar aggregates on JOIN -------------------------------------

def test_scalar_count(fx):
    assert _join(fx, "laptop").count() == 6


def test_scalar_count_sum_avg(fx):
    r = _join(fx, "laptop").agg(
        F.count("*").alias("c"), F.sum("p.price").alias("s"),
        F.avg("p.rating").alias("a")).collect()[0]
    assert (r.c, r.s, r.a) == (6, pytest.approx(5599.9400000000005), 4.0)


def test_scalar_min_max(fx):
    r = _join(fx, "laptop").agg(F.min("p.price"), F.max("p.price")) \
        .collect()[0]
    assert tuple(r) == (499.99, 1299.99)


def test_scalar_mixed_five(fx):
    r = _join(fx, "laptop").agg(
        F.count("*"), F.sum("p.price"), F.avg("p.price"),
        F.min("p.rating"), F.max("p.rating")).collect()[0]
    assert tuple(r) == (6, pytest.approx(5599.9400000000005),
                        pytest.approx(933.3233333333334), 2, 5)


# --- SECTION 2: empty result sets ---------------------------------------------

def test_empty_match_count_zero(fx):
    assert _join(fx, "nonexistent_term_xyz").count() == 0


def test_empty_match_null_aggregates(fx):
    r = _join(fx, "nonexistent_term_xyz").agg(
        F.sum("p.price"), F.avg("p.rating"),
        F.min("p.price"), F.max("p.price")).collect()[0]
    assert tuple(r) == (None, None, None, None)


# --- SECTION 3: broader predicates / COUNT(col) -------------------------------

def test_broad_or_count(fx):
    assert _join(fx, "laptop OR shoes OR jacket OR toy").count() == 9


def test_count_column(fx):
    r = _join(fx, "laptop").agg(F.count("p.rating")).collect()[0]
    assert r[0] == 6


def test_post_join_numeric_filter(fx):
    # SECTION 12 twin: p.price > 500 applied above the join
    r = _join(fx, "laptop").filter(F.col("p.price") > 500).agg(
        F.count("*"), F.sum("p.price")).collect()[0]
    assert tuple(r) == (4, pytest.approx(4599.96))


# --- SECTION 4: GROUP BY on JOIN ----------------------------------------------

def test_groupby_category_count(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .count().orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 4), ("Sports", 2), ("Toys", 2)]


def test_groupby_multi_agg(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.count("*"), F.sum("p.price"), F.avg("p.rating"),
                F.min("p.price"), F.max("p.price"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 4, pytest.approx(4599.96), 5.0, 999.99, 1299.99),
        ("Sports", 2, pytest.approx(179.98), 4.0, 89.99, 89.99),
        ("Toys", 2, pytest.approx(999.98), 2.0, 499.99, 499.99)]


def test_groupby_two_columns(fx):
    got = (_join(fx, "laptop OR shoes")
           .groupBy("p.category", "t.tag_name").count()
           .orderBy("category", "tag_name").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", "computer", 1), ("Electronics", "gaming", 1),
        ("Electronics", "tech", 2), ("Sports", "fitness", 1),
        ("Sports", "running", 1), ("Toys", "kids", 1),
        ("Toys", "tech", 1)]


# --- SECTION 5: NULL handling (orphan product) --------------------------------

def test_orphan_excluded_by_inner_join(fx):
    # the orphan matches 'orphan' but has no tags → INNER JOIN drops it
    j = _join(fx, "laptop OR orphan")
    assert j.count() == 6
    r = j.agg(F.sum("p.price"), F.avg("p.rating")).collect()[0]
    assert tuple(r) == (pytest.approx(5599.9400000000005), 4.0)


# --- SECTION 6: COUNT(DISTINCT) both directions -------------------------------

def test_count_distinct_tags_per_category(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.countDistinct("t.tag_name"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 3), ("Sports", 2), ("Toys", 2)]


def test_count_distinct_categories_per_tag(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("t.tag_name")
           .agg(F.countDistinct("p.category"))
           .orderBy("tag_name").collect())
    assert [tuple(r) for r in got] == [
        ("computer", 1), ("fitness", 1), ("gaming", 1), ("kids", 1),
        ("running", 1), ("tech", 2)]


# --- SECTION 7: LEFT / RIGHT OUTER aggregates ----------------------------------

def test_left_join_counts(fx):
    got = (_join(fx, "laptop OR shoes", how="left")
           .groupBy("p.category").agg(F.count("t.tag_name"),
                                      F.sum("p.price"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 4, pytest.approx(4599.96)),
        ("Sports", 2, pytest.approx(179.98)),
        ("Toys", 2, pytest.approx(999.98))]


def test_right_join_orphan_tag_counts_zero(fx):
    """RIGHT JOIN keeps the product-less orphan_tag row; COUNT of the
    NULL-extended product side is 0 for it."""
    products, tags, p_idx, t_idx = fx
    tm = compile_query(t_idx, ast.Parse("tech OR orphan_tag",
                                        field="tag_name")) \
        .select(F.col("doc_id").alias("t_k"))
    matched_tags = tags.alias("t").join(tm, F.col("t.id") == F.col("t_k"))
    j = products.alias("p").join(
        matched_tags, F.col("p.id") == F.col("t.product_id"), "right")
    got = (j.groupBy("t.tag_name").agg(F.count("p.category"))
           .orderBy("tag_name").collect())
    assert [tuple(r) for r in got] == [("orphan_tag", 0), ("tech", 3)]


# --- SECTION 8: composite ON clause -------------------------------------------

def test_composite_join_keys(spark):
    comp_a = spark.createDataFrame(
        [(1, "laptop fast", 10, 20), (2, "shoes nice", 30, 40),
         (3, "laptop pro", 10, 20)],
        "id int, description string, x int, y int")
    comp_b = spark.createDataFrame(
        [(1, "B1", 10, 20), (2, "B2", 30, 40)],
        "id int, name string, x int, y int")
    a_idx = build_index(comp_a, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")],
        numeric_fields=[{"name": "x", "fast": True},
                        {"name": "y", "fast": True}]))
    m = compile_query(a_idx, ast.Parse("laptop OR shoes",
                                       field="description")) \
        .select(F.col("doc_id").alias("a_k"))
    j = (comp_a.alias("a").join(m, F.col("a.id") == F.col("a_k"))
         .join(comp_b.alias("b"),
               (F.col("a.x") == F.col("b.x"))
               & (F.col("a.y") == F.col("b.y"))))
    assert j.count() == 3


# --- SECTION 9: single-table sanity -------------------------------------------

def test_single_table_count(fx):
    products, tags, p_idx, _ = fx
    m = compile_query(p_idx, ast.Parse("laptop", field="description"))
    assert m.count() == 3


# --- SECTION 10: STDDEV / VARIANCE --------------------------------------------

def test_stddev_variance_sample(fx):
    r = _join(fx, "laptop OR shoes").agg(
        F.stddev("p.price"), F.variance("p.price")).collect()[0]
    assert r[0] == pytest.approx(495.71737339507706, rel=1e-12)
    assert r[1] == pytest.approx(245735.71428571426, rel=1e-12)


def test_stddev_pop_grouped(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.stddev_pop("p.price"), F.var_pop("p.price"))
           .orderBy("category").collect())
    assert [(r[0], pytest.approx(r[1]), pytest.approx(r[2]))
            for r in got] == [
        ("Electronics", pytest.approx(150.0), pytest.approx(22500.0)),
        ("Sports", pytest.approx(0.0), pytest.approx(0.0)),
        ("Toys", pytest.approx(0.0), pytest.approx(0.0))]


# --- SECTION 11: timestamp / timestamptz MIN-MAX -------------------------------

def test_timestamp_min_max_join(spark):
    ts_orders = spark.createDataFrame(
        [(1, "Laptop order", "Electronics",
          datetime.datetime(2024, 1, 15, 10, 30)),
         (2, "Phone order", "Electronics",
          datetime.datetime(2024, 3, 20, 14, 45)),
         (3, "Shoes order", "Sports",
          datetime.datetime(2024, 6, 10, 8, 15))],
        "id int, description string, category string, created_at timestamp_ntz")
    ts_items = spark.createDataFrame(
        [(1, 1, "laptop"), (2, 1, "charger"), (3, 2, "phone"),
         (4, 3, "shoes"), (5, 3, "socks")],
        "id int, order_id int, item_name string")
    o_idx = build_index(ts_orders, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category",
                                                 fast=True)]))
    m = compile_query(o_idx, ast.Parse("order", field="description")) \
        .select(F.col("doc_id").alias("o_k"))
    j = (ts_orders.alias("o").join(m, F.col("o.id") == F.col("o_k"))
         .join(ts_items.alias("i"),
               F.col("o.id") == F.col("i.order_id")))
    r = j.agg(F.min("o.created_at"), F.max("o.created_at")).collect()[0]
    assert tuple(r) == (datetime.datetime(2024, 1, 15, 10, 30),
                        datetime.datetime(2024, 6, 10, 8, 15))
    got = (j.groupBy("o.category")
           .agg(F.min("o.created_at"), F.max("o.created_at"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", datetime.datetime(2024, 1, 15, 10, 30),
         datetime.datetime(2024, 3, 20, 14, 45)),
        ("Sports", datetime.datetime(2024, 6, 10, 8, 15),
         datetime.datetime(2024, 6, 10, 8, 15))]


def test_timestamptz_mixed_zones_min_max(spark):
    """Mixed source zones (+05:30, -04:00, UTC, America/New_York EDT,
    Asia/Tokyo) must aggregate as INSTANTS — any tz mishandling shows
    up as a wrong min/max (the reference renders the same instants in
    PST/PDT; asserted here as their UTC equivalents)."""
    def tz(h, m=0):
        return timezone(timedelta(hours=h, minutes=m))
    rows = [
        (1, "Laptop order", "Electronics",
         datetime.datetime(2024, 1, 15, 10, 30, tzinfo=tz(5, 30))),
        (2, "Phone order", "Electronics",
         datetime.datetime(2024, 3, 20, 14, 45, tzinfo=tz(-4))),
        (3, "Shoes order", "Sports",
         datetime.datetime(2024, 6, 10, 8, 15, tzinfo=tz(0))),
        (4, "Tablet order", "Electronics",
         datetime.datetime(2024, 7, 4, 12, 0, tzinfo=tz(-4))),  # EDT
        (5, "Jacket order", "Sports",
         datetime.datetime(2024, 12, 25, 0, 0, tzinfo=tz(9))),  # JST
    ]
    tstz_orders = spark.createDataFrame(
        rows, "id int, description string, category string, "
              "created_at timestamp")
    items = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 3), (5, 3), (6, 4), (7, 5)],
        "id int, order_id int")
    o_idx = build_index(tstz_orders, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category",
                                                 fast=True)]))
    m = compile_query(o_idx, ast.Parse("order", field="description")) \
        .select(F.col("doc_id").alias("o_k"))
    j = (tstz_orders.alias("o").join(m, F.col("o.id") == F.col("o_k"))
         .join(items.alias("i"), F.col("o.id") == F.col("i.order_id")))
    utc = timezone.utc

    def inst(r):
        return r.replace(tzinfo=utc) if r.tzinfo is None else \
            r.astimezone(utc)
    r = j.agg(F.min("o.created_at"), F.max("o.created_at")).collect()[0]
    # 'Sun Jan 14 21:00:00 2024 PST' / 'Tue Dec 24 07:00:00 2024 PST'
    assert inst(r[0]) == datetime.datetime(2024, 1, 15, 5, 0, tzinfo=utc)
    assert inst(r[1]) == datetime.datetime(2024, 12, 24, 15, 0,
                                           tzinfo=utc)
    got = (j.groupBy("o.category")
           .agg(F.min("o.created_at"), F.max("o.created_at"))
           .orderBy("category").collect())
    assert [(g[0], inst(g[1]), inst(g[2])) for g in got] == [
        ("Electronics",
         datetime.datetime(2024, 1, 15, 5, 0, tzinfo=utc),    # Jan14 21 PST
         datetime.datetime(2024, 7, 4, 16, 0, tzinfo=utc)),   # Jul04 09 PDT
        ("Sports",
         datetime.datetime(2024, 6, 10, 8, 15, tzinfo=utc),   # Jun10 0115 PDT
         datetime.datetime(2024, 12, 24, 15, 0, tzinfo=utc))]  # Dec24 07 PST


# --- SECTION 11b: ORDER BY aggregate NULLS FIRST/LAST ---------------------------

def _nullsort(fx, order):
    j = _join(fx, "nullsort", how="left")
    s = F.sum("t.product_id")
    g = j.groupBy("p.category").agg(s.alias("sum"))
    col = F.col("sum")
    order_expr = {"desc_nulls_last": col.desc_nulls_last(),
                  "asc_nulls_first": col.asc_nulls_first(),
                  "desc": col.desc_nulls_first()}[order]
    return [(r.category, r.sum)
            for r in g.orderBy(order_expr).limit(2).collect()]


def test_order_by_sum_desc_nulls_last(fx):
    assert _nullsort(fx, "desc_nulls_last") == [
        ("NullSortB", 19804), ("NullSortA", None)]


def test_order_by_sum_asc_nulls_first(fx):
    assert _nullsort(fx, "asc_nulls_first") == [
        ("NullSortA", None), ("NullSortB", 19804)]


def test_order_by_sum_desc_default_nulls_first(fx):
    # PG default for DESC is NULLS FIRST
    assert _nullsort(fx, "desc") == [
        ("NullSortA", None), ("NullSortB", 19804)]


# --- SECTION 13: cross-table OR predicates -------------------------------------

def test_cross_table_or_heap(fx):
    j = _join(fx, "laptop").filter(
        (F.col("t.id") == 1) | (F.col("p.id") == 1))
    assert j.count() == 2


def test_cross_table_or_indexed_both_sides(fx):
    products, tags, p_idx, t_idx = fx
    pm = compile_query(p_idx, ast.Parse("laptop", field="description")) \
        .select(F.col("doc_id").alias("p_k"))
    t1 = compile_query(t_idx, ast.Term("id", 1)) \
        .select(F.col("doc_id").alias("t1_k"))
    p1 = compile_query(p_idx, ast.Term("id", 1)) \
        .select(F.col("doc_id").alias("p1_k"))
    j = (products.alias("p").join(pm, F.col("p.id") == F.col("p_k"))
         .join(tags.alias("t"), F.col("p.id") == F.col("t.product_id"))
         .join(t1, F.col("t.id") == F.col("t1_k"), "left")
         .join(p1, F.col("p.id") == F.col("p1_k"), "left")
         .filter(F.col("t1_k").isNotNull() | F.col("p1_k").isNotNull()))
    assert j.count() == 2


# --- SECTION 13b: HAVING --------------------------------------------------------

def test_having_count(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.count("*").alias("c"))
           .filter(F.col("c") > 1).orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 4), ("Sports", 2), ("Toys", 2)]


def test_having_sum(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.count("*").alias("c"), F.sum("p.price").alias("s"))
           .filter(F.col("s") > 100).orderBy("category").collect())
    assert [(r.category, r.c, pytest.approx(r.s)) for r in got] == [
        ("Electronics", 4, pytest.approx(4599.96)),
        ("Sports", 2, pytest.approx(179.98)),
        ("Toys", 2, pytest.approx(999.98))]


# --- SECTION 14: BOOL_AND/OR, STRING_AGG, ARRAY_AGG ------------------------------

def test_bool_and_or(fx):
    got = (_join(fx, "laptop OR shoes OR toy").groupBy("p.category")
           .agg(F.bool_and("p.in_stock"), F.bool_or("p.in_stock"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", True, True), ("Sports", True, True),
        ("Toys", False, False)]


def test_string_agg_multiset(fx):
    # without ORDER BY the aggregate's element order is unspecified —
    # compare as a sorted multiset (the reference pins insertion order,
    # which PG itself does not guarantee)
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.collect_list("t.tag_name").alias("tags"))
           .orderBy("category").collect())
    assert [(r.category, sorted(r.tags)) for r in got] == [
        ("Electronics", ["computer", "gaming", "tech", "tech"]),
        ("Sports", ["fitness", "running"]),
        ("Toys", ["kids", "tech"])]


def test_string_agg_ordered(fx):
    # SECTION 16: STRING_AGG(tag, ', ' ORDER BY tag) — exact pins
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.array_join(F.array_sort(F.collect_list("t.tag_name")),
                             ", ").alias("s"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", "computer, gaming, tech, tech"),
        ("Sports", "fitness, running"),
        ("Toys", "kids, tech")]


def test_string_agg_ordered_desc(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.array_join(
               F.reverse(F.array_sort(F.collect_list("t.tag_name"))),
               ", ").alias("s"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", "tech, tech, gaming, computer"),
        ("Sports", "running, fitness"),
        ("Toys", "tech, kids")]


def test_array_agg_ordered(fx):
    got = (_join(fx, "laptop OR shoes").groupBy("p.category")
           .agg(F.array_sort(F.collect_list("t.tag_name")).alias("a"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", ["computer", "gaming", "tech", "tech"]),
        ("Sports", ["fitness", "running"]),
        ("Toys", ["kids", "tech"])]


# --- SECTION 15: FULL OUTER JOIN aggregates --------------------------------------

def test_full_outer_counts(fx):
    """WHERE on the p side filters NULL-extended rows after the FULL
    JOIN — identical to the inner result (8 rows, no NULL counts)."""
    j = _join(fx, "laptop OR shoes", how="full") \
        .filter(F.col("p_k").isNotNull())
    r = j.agg(F.count("*"), F.count("p.category"),
              F.count("t.tag_name")).collect()[0]
    assert tuple(r) == (8, 8, 8)
    got = (j.groupBy("p.category")
           .agg(F.count("*"), F.sum("p.price"))
           .orderBy("category").collect())
    assert [(g[0], g[1], pytest.approx(g[2])) for g in got] == [
        ("Electronics", 4, pytest.approx(4599.96)),
        ("Sports", 2, pytest.approx(179.98)),
        ("Toys", 2, pytest.approx(999.98))]


# --- SECTION 17: JSON sub-field GROUP BY + per-aggregate FILTER -------------------

def test_json_subfield_groupby_on_join(spark):
    items = spark.createDataFrame(
        [(1, '{"category": "Electronics", "brand": "Acme"}'),
         (2, '{"category": "Electronics", "brand": "Beta"}'),
         (3, '{"category": "Toys", "brand": "Acme"}')],
        "id int, metadata string")
    orders = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 5), (3, 2, 3), (4, 3, 7)],
        "id int, item_id int, qty int")
    i_idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata", tokenizer="json")]))
    m = compile_query(i_idx, ast.All()).select(
        F.col("doc_id").alias("i_k"))
    j = (items.alias("i").join(m, F.col("i.id") == F.col("i_k"))
         .join(orders.alias("o"), F.col("i.id") == F.col("o.item_id")))
    got = (j.groupBy(F.get_json_object("i.metadata", "$.category")
                     .alias("category"))
           .agg(F.count("*"), F.sum("o.qty"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Electronics", 3, 18), ("Toys", 1, 7)]


def test_per_aggregate_filter_on_join(fx):
    got = (_join(fx, "laptop OR shoes OR jacket").groupBy("p.category")
           .agg(F.count("*").alias("total"),
                F.count(F.when(F.col("p.price") > 100, 1))
                .alias("expensive"))
           .orderBy("category").collect())
    assert [tuple(r) for r in got] == [
        ("Clothing", 1, 1), ("Electronics", 4, 4),
        ("Sports", 2, 0), ("Toys", 2, 2)]
