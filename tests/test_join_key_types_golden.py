"""join_key_types.out golden (PUBLIC reference behavior, tables
replicated inline): search-filtered joins across every join-key shape —
TEXT keys, composite (int, text) keys, join-key value 0 (magic-key
collision regression), NULL keys excluded by standard SQL semantics,
multi-column composite keys, and UUID keys.

Ref: pg_search/tests/pg_regress/expected/join_key_types.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _search_semi(idx, docs, q):
    m = compile_query(idx, q).select("doc_id")
    return docs.join(m, docs[idx.schema.key_field] == m["doc_id"],
                     "left_semi")


def test_text_join_keys(spark):
    customers = spark.createDataFrame(
        [("CUST-001", "Alice Corp"), ("CUST-002", "Bob Industries"),
         ("CUST-003", "Carol Enterprises")],
        "customer_code string, name string")
    orders = spark.createDataFrame(
        [(1, "CUST-001", "wireless mouse order", 29.99),
         (2, "CUST-001", "keyboard order premium", 89.99),
         (3, "CUST-002", "wireless headphones bulk", 599.97),
         (4, "CUST-003", "monitor stand", 49.99),
         (5, "CUST-002", "cable wireless charger", 19.99)],
        "id long, customer_code string, description string, amount double")
    oidx = build_index(orders, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    o = _search_semi(oidx, orders,
                     ast.Parse("wireless", field="description"))
    rows = (o.join(F.broadcast(customers), "customer_code")
            .orderBy("id").limit(10)
            .select("id", "description", "name").collect())
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, "wireless mouse order", "Alice Corp"),
        (3, "wireless headphones bulk", "Bob Industries"),
        (5, "cable wireless charger", "Bob Industries")]


def test_composite_join_keys(spark):
    warehouses = spark.createDataFrame(
        [(1, "WH-A", "East Coast Main"), (1, "WH-B", "East Coast Backup"),
         (2, "WH-A", "West Coast Main"),
         (2, "WH-B", "West Coast Express")],
        "region_id long, warehouse_code string, name string")
    inventory = spark.createDataFrame(
        [(1, 1, "WH-A", "wireless mouse", 100),
         (2, 1, "WH-A", "keyboard", 50),
         (3, 1, "WH-B", "monitor", 25),
         (4, 2, "WH-A", "wireless headphones", 75),
         (5, 2, "WH-B", "wireless charger", 200)],
        "id long, region_id long, warehouse_code string, "
        "product_name string, quantity long")
    iidx = build_index(inventory, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="product_name")]))
    i = _search_semi(iidx, inventory,
                     ast.Parse("wireless", field="product_name"))
    rows = (i.join(F.broadcast(warehouses),
                   ["region_id", "warehouse_code"])
            .orderBy("id").limit(10)
            .select("id", "product_name", "name").collect())
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, "wireless mouse", "East Coast Main"),
        (4, "wireless headphones", "West Coast Main"),
        (5, "wireless charger", "West Coast Express")]


def test_zero_join_key(spark):
    # join key value 0 is a valid key, never a magic/cross-join marker
    types = spark.createDataFrame(
        [(0, "Uncategorized"), (1, "Electronics"), (2, "Accessories")],
        "type_id long, type_name string")
    items = spark.createDataFrame(
        [(1, 0, "Mystery Box", "wireless mystery item"),
         (2, 0, "Unknown Gadget", "unclassified wireless device"),
         (3, 1, "Smart Speaker", "wireless bluetooth speaker"),
         (4, 2, "Phone Case", "protective case")],
        "id long, type_id long, name string, details string")
    idx = build_index(items, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="details")]))
    i = _search_semi(idx, items, ast.Parse("wireless", field="details"))
    rows = (i.join(F.broadcast(types), "type_id")
            .orderBy("id").limit(10)
            .select("id", "name", "type_name").collect())
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, "Mystery Box", "Uncategorized"),
        (2, "Unknown Gadget", "Uncategorized"),
        (3, "Smart Speaker", "Electronics")]
    zero = (items.filter(F.col("type_id") == 0)
            .join(types, "type_id").orderBy("id")
            .select("id", "name", "type_name", "type_id").collect())
    assert [(r[0], r[1], r[2], r[3]) for r in zero] == [
        (1, "Mystery Box", "Uncategorized", 0),
        (2, "Unknown Gadget", "Uncategorized", 0)]


def test_null_keys_excluded(spark):
    cats = spark.createDataFrame(
        [(1, "Electronics"), (2, "Books"), (3, "Clothing")],
        "id long, name string")
    items = spark.createDataFrame(
        [(101, "Laptop", "Powerful laptop for programming", 1),
         (102, "Phone", "Smartphone with great camera", 1),
         (103, "Novel", "Bestselling fiction novel", 2),
         (104, "Orphan Item", "Item with no category assignment", None),
         (105, "Another Orphan", "Another uncategorized item", None)],
        "id long, name string, content string, category_id long")
    idx = build_index(items, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content")]))
    i = _search_semi(idx, items,
                     ast.Parse("item OR laptop OR novel",
                               field="content"))
    rows = (i.join(cats.withColumnRenamed("id", "category_id")
                   .withColumnRenamed("name", "category_name"),
                   "category_id")
            .orderBy("id").limit(10)
            .select("name", "category_name").collect())
    assert [(r[0], r[1]) for r in rows] == [
        ("Laptop", "Electronics"), ("Novel", "Books")]


def test_multi_column_composite_keys(spark):
    details = spark.createDataFrame(
        [(1, 1, "Widget A", "High quality widget for industrial use"),
         (1, 2, "Widget B", "Standard widget for general purpose"),
         (2, 1, "Gadget X", "Advanced gadget with wireless connectivity"),
         (2, 2, "Gadget Y", "Basic gadget for everyday use")],
        "order_id long, line_num long, product_name string, "
        "description string")
    ditems = spark.createDataFrame(
        [(1, 1, 1, 10, "Rush order for wireless widgets"),
         (2, 1, 2, 5, "Standard delivery"),
         (3, 2, 1, 3, "Wireless gadget order"),
         (4, 2, 2, 7, "Bulk order")],
        "id long, order_id long, line_num long, quantity long, "
        "notes string")
    # search side keyed on a synthetic id; composite (order_id, line_num)
    # join condition rides the fast columns
    d2 = details.withColumn(
        "did", F.col("order_id") * 10 + F.col("line_num"))
    didx = build_index(d2, IndexSchema(
        key_field="did", text_fields=[FieldConfig(name="description")]))
    d = _search_semi(didx, d2,
                     ast.Parse("wireless", field="description"))
    rows = (d.join(ditems, ["order_id", "line_num"])
            .orderBy("order_id", "line_num").limit(10)
            .select("product_name", "quantity", "notes").collect())
    assert [(r[0], r[1], r[2]) for r in rows] == [
        ("Gadget X", 3, "Wireless gadget order")]


def test_uuid_join_keys(spark):
    custs = spark.createDataFrame(
        [("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11", "Alice"),
         ("b0eebc99-9c0b-4ef8-bb6d-6bb9bd380a22", "Bob"),
         ("c0eebc99-9c0b-4ef8-bb6d-6bb9bd380a33", "Carol")],
        "cid string, name string")
    orders = spark.createDataFrame(
        [(1, "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
          "Wireless keyboard order", 99.99),
         (2, "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
          "USB hub purchase", 29.99),
         (3, "b0eebc99-9c0b-4ef8-bb6d-6bb9bd380a22",
          "Monitor stand order", 49.99),
         (4, "c0eebc99-9c0b-4ef8-bb6d-6bb9bd380a33",
          "Wireless mouse order", 39.69)],
        "id long, customer_id string, description string, amount double")
    oidx = build_index(orders, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="customer_id",
                                 field_type="uuid")]))
    o = _search_semi(oidx, orders,
                     ast.Parse("wireless", field="description"))
    rows = (o.join(F.broadcast(custs),
                   o["customer_id"] == custs["cid"])
            .orderBy("id").limit(10)
            .select("description", "name").collect())
    assert [(r[0], r[1]) for r in rows] == [
        ("Wireless keyboard order", "Alice"),
        ("Wireless mouse order", "Carol")]
