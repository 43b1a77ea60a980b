"""join_deferred_visibility.out golden (PUBLIC reference behavior):
search-driven joins must only ever surface LIVE rows — inner joins,
mixed INNER+SEMI (EXISTS) and INNER+ANTI (NOT EXISTS) trees, self-joins
with two predicates over one index, and (Test 4) rows DELETED after
indexing must not reappear through the join even though their postings
still exist in older segments.

Ref: pg_search/tests/pg_regress/expected/join_deferred_visibility.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ITEMS = [
    (1, "Wireless Mouse", "ergonomic wireless mouse with Bluetooth", 10),
    (2, "USB Cable", "high-speed USB-C cable for data transfer", 20),
    (3, "Keyboard", "mechanical keyboard with RGB lighting", 10),
    (4, "Monitor Stand", "adjustable monitor stand for ergonomic setup", 30),
    (5, "Webcam", "HD webcam for video conferencing", 20),
    (6, "Headphones", "wireless noise-canceling headphones", 10),
    (7, "Mouse Pad", "large gaming mouse pad", 30),
    (8, "Cable Organizer", "desktop cable organizer", 20),
]
TAGS = [(10, "peripherals", "hardware accessories for computers"),
        (20, "cables", "connectivity and data transfer cables"),
        (30, "stands", "ergonomic desk accessories and stands")]
REVIEWS = [
    (100, 1, "great wireless mouse very ergonomic", 5),
    (101, 1, "decent mouse but battery drains fast", 3),
    (102, 2, "perfect cable for fast charging", 5),
    (103, 3, "amazing keyboard love the RGB", 5),
    (104, 4, "solid monitor stand adjustable", 4),
    (105, 5, "webcam works great for meetings", 4),
    (106, 6, "noise canceling is excellent", 5),
    (107, 7, "nice large mouse pad", 4),
    (108, 8, "keeps cables organized and tidy", 4),
]


@pytest.fixture(scope="module")
def store(spark):
    items = spark.createDataFrame(
        ITEMS, "id int, name string, description string, tag_id int")
    tags = spark.createDataFrame(TAGS, "id int, label string, "
                                       "category string")
    reviews = spark.createDataFrame(
        REVIEWS, "id int, item_id int, body string, rating int")
    i_idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name"),
                     FieldConfig(name="description")],
        numeric_fields=["tag_id"]))
    r_idx = build_index(reviews, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")],
        numeric_fields=["item_id", "rating"]))
    return items, tags, reviews, i_idx, r_idx


def _items_matched(store_fix, qstr):
    items, _, _, i_idx, _ = store_fix
    m = compile_query(i_idx, ast.Parse(qstr, field="description")) \
        .select("doc_id")
    return items.join(m, items["id"] == m["doc_id"], "left_semi")


def test_1_inner_join(store):
    _, tags, _, _, _ = store
    got = (_items_matched(store, "wireless")
           .join(tags.select(F.col("id").alias("tid"), "label"),
                 F.col("tag_id") == F.col("tid"))
           .orderBy("id").limit(5)
           .select("id", "name", "label").collect())
    assert [tuple(r) for r in got] == [
        (1, "Wireless Mouse", "peripherals"),
        (6, "Headphones", "peripherals")]


def test_2_inner_plus_semi(store):
    _, tags, reviews, _, r_idx = store
    great = reviews.join(
        compile_query(r_idx, ast.Parse("great", field="body"))
        .select("doc_id"),
        reviews["id"] == F.col("doc_id"), "left_semi")
    got = (_items_matched(store, "wireless OR keyboard")
           .join(tags.select(F.col("id").alias("tid")),
                 F.col("tag_id") == F.col("tid"), "left_semi")
           .join(great.select(F.col("item_id").alias("rk")).distinct(),
                 F.col("id") == F.col("rk"), "left_semi")
           .orderBy("id").limit(5).select("id", "name").collect())
    assert [tuple(r) for r in got] == [(1, "Wireless Mouse")]


def test_3_self_join_two_predicates(store):
    a = _items_matched(store, "wireless") \
        .select(F.col("id").alias("aid"), F.col("name").alias("a_name"),
                F.col("tag_id").alias("a_tag"))
    b = _items_matched(store, "keyboard") \
        .select(F.col("id").alias("bid"), F.col("name").alias("b_name"),
                F.col("tag_id").alias("b_tag"))
    got = (a.join(b, F.col("a_tag") == F.col("b_tag"))
           .orderBy("aid", "bid").limit(5)
           .select("aid", "a_name", "bid", "b_name").collect())
    assert [tuple(r) for r in got] == [
        (1, "Wireless Mouse", 3, "Keyboard"),
        (6, "Headphones", 3, "Keyboard")]


def test_4_deleted_rows_invisible_through_join(spark, tmp_path_factory):
    """Rows deleted AFTER indexing must not surface through the join —
    the deferred-visibility guarantee, via the segmented index's
    tombstone path."""
    from sparksearch.streaming.indexer import (StreamingIndexer,
                                               delete_docs,
                                               open_segmented_index)
    tdir = str(tmp_path_factory.mktemp("joinvis"))
    all_items = ITEMS + [
        (9, "Deleted Wireless Speaker",
         "portable wireless speaker with bass", 10),
        (10, "Deleted Wireless Charger", "fast wireless charging pad", 20),
    ]
    df = (spark.createDataFrame(
              [(str(i), 0, d, n, t) for i, n, d, t in all_items],
              "conv_id string, turn_idx int, text string, name string, "
              "tag_id int")
          .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000))))
    src = f"{tdir}/src"
    df.coalesce(1).write.parquet(src)
    schema = IndexSchema(key_field="doc_id",
                         text_fields=[FieldConfig(name="text")])
    ix = StreamingIndexer(schema, f"{tdir}/idx", f"{tdir}/ckpt")
    q = ix.start(spark.readStream.schema(df.schema).parquet(src))
    q.processAllAvailable()
    q.stop()
    delete_docs(spark, f"{tdir}/idx", ["9#0", "10#0"])
    docs = df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id",
                              F.col("turn_idx").cast("string")))
    idx = open_segmented_index(spark, f"{tdir}/idx", schema, docs=docs)
    tags = spark.createDataFrame(TAGS, "id int, label string, cat string")
    m = compile_query(idx, ast.Parse("wireless", field="text")) \
        .select(F.col("doc_id").alias("mk"))
    got = (docs.join(m, docs["doc_id"] == F.col("mk"), "left_semi")
           .join(tags.select(F.col("id").alias("tid"), "label"),
                 F.col("tag_id") == F.col("tid"))
           .orderBy(F.col("conv_id").cast("int")).limit(10)
           .select("name", "label").collect())
    assert [tuple(r) for r in got] == [
        ("Wireless Mouse", "peripherals"), ("Headphones", "peripherals")]


def test_5_inner_plus_anti(store):
    _, tags, reviews, _, _ = store
    low = reviews.filter(F.col("rating") < 4)
    got = (_items_matched(store, "wireless OR mouse")
           .join(tags.select(F.col("id").alias("tid")),
                 F.col("tag_id") == F.col("tid"), "left_semi")
           .join(low.select(F.col("item_id").alias("rk")).distinct(),
                 F.col("id") == F.col("rk"), "left_anti")
           .orderBy("id").limit(5).select("id", "name").collect())
    assert [tuple(r) for r in got] == [(6, "Headphones"), (7, "Mouse Pad")]
