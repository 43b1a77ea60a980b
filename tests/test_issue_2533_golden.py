"""issue_2533.out golden (PUBLIC reference behavior): differential
native-SQL vs search-operator equivalence over joins — each pair of
COUNT(*) queries (one with plain equality predicates, one with @@@
keyword-term predicates) must return the SAME count, including under
LEFT/RIGHT joins where the null-extended side makes a @@@ predicate
NULL (three-valued logic: NOT(NULL) = NULL = filtered), and the final
same-column-names-across-tables var-confusion repro.

Spark restatement: each table gains boolean match-flag columns computed
through the real engine (compile_query term match → semi-join flag);
outer joins null-extend the flags exactly as PG null-extends the @@@
result, so the SAME boolean expression over flags must equal the
native-predicate count.

Ref: pg_search/tests/pg_regress/expected/issue_2533.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

USERS = [
    (1, "bob", "blue", "20"), (2, "anchovy", "purple", "78"),
    (3, "sally", "orange", "21"), (4, "alice", "green", "40"),
    (5, "brandy", "purple", "79"), (6, "anchovy", "green", "69"),
    (7, "sally", "green", "42"), (8, "bob", "pink", "7"),
    (9, "cloe", "green", "49"), (10, "brisket", "purple", "65"),
    (11, "alice", "pink", "39"),
]
PRODUCTS = [
    (1, "bob", "blue", "20"), (2, "bob", "pink", "20"),
    (3, "brandy", "purple", "32"), (4, "alice", "red", "46"),
    (5, "brandy", "pink", "41"), (6, "brisket", "yellow", "22"),
    (7, "alice", "yellow", "6"), (8, "sally", "yellow", "48"),
    (9, "brandy", "purple", "69"), (10, "brandy", "green", "21"),
    (11, "sally", "yellow", "88"),
]
ORDERS = [
    (1, "bob", "blue", "20"), (2, "brisket", "green", "28"),
    (3, "alice", "yellow", "13"), (4, "alice", "purple", "44"),
    (5, "brandy", "green", "33"), (6, "brisket", "red", "58"),
    (7, "cloe", "purple", "34"), (8, "brandy", "red", "13"),
    (9, "bob", "green", "75"), (10, "cloe", "red", "53"),
    (11, "brandy", "green", "92"),
]

# flags each table needs: (flag_name, ast query)
FLAGS = [
    ("m_name_bob", ast.Term("name", "bob")),
    ("m_color_blue", ast.Term("color", "blue")),
    ("m_age_20", ast.Term("age", "20")),
    ("m_id_3", ast.Term("id", 3)),
]


@pytest.fixture(scope="module")
def tabs(spark):
    out = {}
    for tname, rows in (("users", USERS), ("products", PRODUCTS),
                        ("orders", ORDERS)):
        docs = spark.createDataFrame(
            rows, "id long, name string, color string, age string")
        idx = build_index(docs, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name="name", tokenizer="keyword"),
                         FieldConfig(name="color", tokenizer="keyword"),
                         FieldConfig(name="age", tokenizer="keyword")]))
        flagged = docs
        for fname, q in FLAGS:
            keys = compile_query(idx, q).select(
                F.col("doc_id").alias("__mk"))
            flagged = (flagged.join(
                keys, flagged["id"] == F.col("__mk"), "left")
                .withColumn(fname, F.col("__mk").isNotNull())
                .drop("__mk"))
        out[tname] = (docs, flagged)
        docs.createOrReplaceTempView(tname)
        flagged.createOrReplaceTempView(f"{tname}_f")
    out["spark"] = spark
    return out


def _pair(tabs_fix, join_sql, where_sql, flag_where_sql, expected):
    spark = tabs_fix["spark"]
    native = spark.sql(
        f"SELECT count(*) AS c FROM {join_sql} WHERE {where_sql}"
    ).collect()[0]["c"]
    flagged = spark.sql(
        f"SELECT count(*) AS c FROM {join_sql.replace('users', 'users_f').replace('products', 'products_f').replace('orders', 'orders_f')} "
        f"WHERE {flag_where_sql}").collect()[0]["c"]
    assert native == flagged == expected


def test_idx50_left_join_or_not(tabs):
    _pair(tabs,
          "users LEFT JOIN products ON users.color = products.color",
          "(users.name = 'bob') AND ((users.color = 'blue') AND "
          "(users.name = 'bob')) AND (products.name = 'bob') "
          "OR (NOT (products.age = '20')) AND (users.name = 'bob') "
          "OR ((users.color = 'blue') AND (users.name = 'bob')) AND "
          "(products.color = 'blue') OR (NOT (products.name = 'bob'))",
          "(users_f.m_name_bob) AND ((users_f.m_color_blue) AND "
          "(users_f.m_name_bob)) AND (products_f.m_name_bob) "
          "OR (NOT (products_f.m_age_20)) AND (users_f.m_name_bob) "
          "OR ((users_f.m_color_blue) AND (users_f.m_name_bob)) AND "
          "(products_f.m_color_blue) OR (NOT (products_f.m_name_bob))",
          13)


def test_idx4_inner_join_and_not(tabs):
    _pair(tabs,
          "users JOIN orders ON users.color = orders.color",
          "(users.name = 'bob') AND ((users.color = 'blue') OR "
          "(NOT (users.name = 'bob'))) AND NOT ((orders.name = 'bob') "
          "AND (orders.age = '20')) OR (orders.age = '20') AND "
          "NOT (users.name = 'bob') OR ((users.color = 'blue') OR "
          "(NOT (users.name = 'bob'))) AND NOT ((orders.name = 'bob') "
          "OR (orders.age = '20')) AND (orders.name = 'bob')",
          "(users_f.m_name_bob) AND ((users_f.m_color_blue) OR "
          "(NOT (users_f.m_name_bob))) AND NOT ((orders_f.m_name_bob) "
          "AND (orders_f.m_age_20)) OR (orders_f.m_age_20) AND "
          "NOT (users_f.m_name_bob) OR ((users_f.m_color_blue) OR "
          "(NOT (users_f.m_name_bob))) AND NOT ((orders_f.m_name_bob) "
          "OR (orders_f.m_age_20)) AND (orders_f.m_name_bob)",
          0)


def test_idx37_inner_join_name_key(tabs):
    _pair(tabs,
          "users JOIN products ON users.name = products.name",
          "(users.color = 'blue') AND ((users.name = 'bob') OR "
          "(NOT (users.color = 'blue'))) AND NOT (products.color = 'blue')"
          " OR ((products.color = 'blue') AND (products.color = 'blue')) "
          "AND NOT (users.color = 'blue') OR ((users.name = 'bob') OR "
          "(NOT (users.color = 'blue'))) AND NOT (products.color = 'blue')"
          " AND ((products.color = 'blue') OR (products.color = 'blue'))",
          "(users_f.m_color_blue) AND ((users_f.m_name_bob) OR "
          "(NOT (users_f.m_color_blue))) AND NOT (products_f.m_color_blue)"
          " OR ((products_f.m_color_blue) AND (products_f.m_color_blue)) "
          "AND NOT (users_f.m_color_blue) OR ((users_f.m_name_bob) OR "
          "(NOT (users_f.m_color_blue))) AND NOT (products_f.m_color_blue)"
          " AND ((products_f.m_color_blue) OR (products_f.m_color_blue))",
          2)


def test_idx46_left_join_double_not(tabs):
    _pair(tabs,
          "users LEFT JOIN products ON users.name = products.name",
          "(users.color = 'blue') AND ((users.age = '20') OR "
          "(NOT (users.color = 'blue'))) AND NOT (products.color = 'blue')"
          " OR ((products.age = '20') OR (products.age = '20')) AND "
          "NOT (users.color = 'blue') OR ((users.age = '20') OR "
          "(NOT (users.color = 'blue'))) AND NOT (products.age = '20') "
          "AND (NOT (NOT (products.name = 'bob')))",
          "(users_f.m_color_blue) AND ((users_f.m_age_20) OR "
          "(NOT (users_f.m_color_blue))) AND NOT (products_f.m_color_blue)"
          " OR ((products_f.m_age_20) OR (products_f.m_age_20)) AND "
          "NOT (users_f.m_color_blue) OR ((users_f.m_age_20) OR "
          "(NOT (users_f.m_color_blue))) AND NOT (products_f.m_age_20) "
          "AND (NOT (NOT (products_f.m_name_bob)))",
          3)


def test_idx55_right_join(tabs):
    _pair(tabs,
          "users RIGHT JOIN products ON users.name = products.name",
          "(users.color = 'blue') AND ((NOT (users.color = 'blue')) OR "
          "(users.color = 'blue')) AND NOT (products.age = '20') OR "
          "((products.name = 'bob') OR (products.age = '20')) AND "
          "NOT (users.color = 'blue') OR ((NOT (users.color = 'blue')) "
          "OR (users.color = 'blue')) AND NOT (products.age = '20') AND "
          "((products.color = 'blue') AND (products.name = 'bob'))",
          "(users_f.m_color_blue) AND ((NOT (users_f.m_color_blue)) OR "
          "(users_f.m_color_blue)) AND NOT (products_f.m_age_20) OR "
          "((products_f.m_name_bob) OR (products_f.m_age_20)) AND "
          "NOT (users_f.m_color_blue) OR ((NOT (users_f.m_color_blue)) "
          "OR (users_f.m_color_blue)) AND NOT (products_f.m_age_20) AND "
          "((products_f.m_color_blue) AND (products_f.m_name_bob))",
          2)


def test_idx83_left_join_tautology(tabs):
    _pair(tabs,
          "orders LEFT JOIN users ON orders.name = users.name",
          "NOT (NOT ((orders.age = '20') OR (NOT (orders.age = '20')))) "
          "AND NOT (users.age = '20') OR ((users.age = '20') OR "
          "(NOT (users.name = 'bob'))) AND NOT NOT (NOT ((NOT "
          "(orders.name = 'bob')) OR (orders.name = 'bob'))) AND "
          "NOT (users.age = '20') OR ((users.age = '20') AND "
          "(NOT (users.color = 'blue')))",
          "NOT (NOT ((orders_f.m_age_20) OR (NOT (orders_f.m_age_20)))) "
          "AND NOT (users_f.m_age_20) OR ((users_f.m_age_20) OR "
          "(NOT (users_f.m_name_bob))) AND NOT NOT (NOT ((NOT "
          "(orders_f.m_name_bob)) OR (orders_f.m_name_bob))) AND "
          "NOT (users_f.m_age_20) OR ((users_f.m_age_20) AND "
          "(NOT (users_f.m_color_blue)))",
          13)


def test_idx92_right_join(tabs):
    _pair(tabs,
          "orders RIGHT JOIN users ON orders.name = users.name",
          "NOT ((NOT (orders.color = 'blue')) AND (NOT "
          "(orders.color = 'blue'))) AND NOT (users.age = '20') OR "
          "((NOT (users.color = 'blue')) OR (users.name = 'bob')) AND "
          "NOT NOT ((NOT (orders.color = 'blue')) OR (NOT "
          "(orders.color = 'blue'))) AND NOT (users.age = '20') OR "
          "((NOT (users.color = 'blue')) AND (users.color = 'blue'))",
          "NOT ((NOT (orders_f.m_color_blue)) AND (NOT "
          "(orders_f.m_color_blue))) AND NOT (users_f.m_age_20) OR "
          "((NOT (users_f.m_color_blue)) OR (users_f.m_name_bob)) AND "
          "NOT NOT ((NOT (orders_f.m_color_blue)) OR (NOT "
          "(orders_f.m_color_blue))) AND NOT (users_f.m_age_20) OR "
          "((NOT (users_f.m_color_blue)) AND (users_f.m_color_blue))",
          13)


def test_idx74_inner_join(tabs):
    _pair(tabs,
          "orders JOIN users ON orders.name = users.name",
          "((orders.age = '20') AND (orders.age = '20')) AND "
          "(orders.color = 'blue') AND NOT (users.age = '20') OR "
          "((users.name = 'bob') OR (NOT (users.name = 'bob'))) AND "
          "NOT ((orders.age = '20') AND (orders.age = '20')) OR "
          "(orders.color = 'blue') AND NOT (users.age = '20') OR "
          "((users.name = 'bob') AND (NOT (users.color = 'blue')))",
          "((orders_f.m_age_20) AND (orders_f.m_age_20)) AND "
          "(orders_f.m_color_blue) AND NOT (users_f.m_age_20) OR "
          "((users_f.m_name_bob) OR (NOT (users_f.m_name_bob))) AND "
          "NOT ((orders_f.m_age_20) AND (orders_f.m_age_20)) OR "
          "(orders_f.m_color_blue) AND NOT (users_f.m_age_20) OR "
          "((users_f.m_name_bob) AND (NOT (users_f.m_color_blue)))",
          14)


def test_same_field_names_across_tables(tabs):
    """The var-confusion repro: products.id vs orders.id must not be
    confused when both tables have identically-named fields."""
    _pair(tabs,
          "products JOIN orders ON products.name = orders.name",
          "(NOT (products.id = 3)) OR ((products.name = 'bob') AND "
          "(orders.id = 3))",
          "(NOT (products_f.m_id_3)) OR ((products_f.m_name_bob) AND "
          "(orders_f.m_id_3))",
          19)
