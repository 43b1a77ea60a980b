"""Deterministic test fixtures.

- ``mock_items``: the reference's canonical 41-row regression corpus
  (paradedb.create_bm25_test_table — pg_search/src/bootstrap/test_table.rs:
  93-113 schema, 280-1090 data), used for BM25 golden parity.
- ``transcripts``: the engine's primary input per BASELINE.json
  input_hint — multi-turn agent transcripts (conv_id, turn_idx, role,
  text, tool, ts), synthesized deterministically so per-turn text is
  regenerable from (seed, conv_id, turn_idx) — that is the per-row
  invariant ("per-turn text equality under stable turn ordering").
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

from sparksearch.schema import FieldConfig, IndexSchema

# description|rating|category|in_stock|created_at|last_updated_date|time|color|location
_MOCK_ROWS = """Ergonomic metal keyboard|4|Electronics|t|2023-05-01 09:12:34|2023-05-03|09:12:34|Silver|United States
Plastic Keyboard|4|Electronics|f|2023-04-15 13:27:09|2023-04-16|13:27:09|Black|Canada
Sleek running shoes|5|Footwear|t|2023-04-28 10:55:43|2023-04-29|10:55:43|Blue|China
White jogging shoes|3|Footwear|f|2023-04-20 16:38:02|2023-04-22|16:38:02|White|United States
Generic shoes|4|Footwear|t|2023-05-02 08:45:11|2023-05-03|08:45:11|Brown|Canada
Compact digital camera|5|Photography|f|2023-04-25 11:20:35|2023-04-26|11:20:35|Black|China
Hardcover book on history|2|Books|t|2023-04-18 14:59:27|2023-04-19|14:59:27|Brown|United States
Organic green tea|3|Groceries|t|2023-04-30 09:18:45|2023-05-01|09:18:45|Green|Canada
Modern wall clock|4|Home Decor|f|2023-04-24 12:37:52|2023-04-25|12:37:52|Silver|China
Colorful kids toy|1|Toys|t|2023-05-04 15:29:12|2023-05-06|15:29:12|Multicolor|United States
Soft cotton shirt|5|Apparel|t|2023-04-29 08:10:17|2023-04-30|08:10:17|Blue|Canada
Innovative wireless earbuds|5|Electronics|t|2023-04-22 10:05:39|2023-04-23|10:05:39|Black|China
Sturdy hiking boots|4|Footwear|t|2023-05-05 13:45:22|2023-05-07|13:45:22|Brown|United States
Elegant glass table|3|Furniture|t|2023-04-26 17:22:58|2023-04-28|17:22:58|Clear|Canada
Refreshing face wash|2|Beauty|f|2023-04-27 09:52:04|2023-04-29|09:52:04|White|China
High-resolution DSLR|4|Photography|t|2023-04-21 14:30:19|2023-04-23|14:30:19|Black|United States
Paperback romantic novel|3|Books|t|2023-05-03 10:08:57|2023-05-04|10:08:57|Multicolor|Canada
Freshly ground coffee beans|5|Groceries|t|2023-04-23 08:40:15|2023-04-25|08:40:15|Brown|China
Artistic ceramic vase|4|Home Decor|f|2023-04-19 15:17:29|2023-04-21|15:17:29|Multicolor|United States
Interactive board game|3|Toys|t|2023-05-01 12:25:06|2023-05-02|12:25:06|Multicolor|Canada
Slim-fit denim jeans|5|Apparel|f|2023-04-28 16:54:33|2023-04-30|16:54:33|Blue|China
Fast charging power bank|4|Electronics|t|2023-04-17 11:35:52|2023-04-19|11:35:52|Black|United States
Comfortable slippers|3|Footwear|t|2023-04-16 09:20:37|2023-04-17|09:20:37|Brown|Canada
Classic leather sofa|5|Furniture|f|2023-05-06 14:45:27|2023-05-08|14:45:27|Brown|China
Anti-aging serum|4|Beauty|t|2023-05-09 10:30:15|2023-05-10|10:30:15|White|United States
Portable tripod stand|4|Photography|t|2023-05-07 15:20:48|2023-05-09|15:20:48|Black|Canada
Mystery detective novel|2|Books|f|2023-05-04 11:55:23|2023-05-05|11:55:23|Multicolor|China
Organic breakfast cereal|5|Groceries|t|2023-05-02 07:40:59|2023-05-03|07:40:59|Brown|United States
Designer wall paintings|5|Home Decor|t|2023-04-30 14:18:37|2023-05-01|14:18:37|Multicolor|Canada
Robot building kit|4|Toys|t|2023-04-29 16:25:42|2023-05-01|16:25:42|Multicolor|China
Sporty tank top|4|Apparel|t|2023-04-27 12:09:53|2023-04-28|12:09:53|Blue|United States
Bluetooth-enabled speaker|3|Electronics|t|2023-04-26 09:34:11|2023-04-28|09:34:11|Black|Canada
Winter woolen socks|5|Footwear|f|2023-04-25 14:55:08|2023-04-27|14:55:08|Gray|China
Rustic bookshelf|4|Furniture|t|2023-04-24 08:20:47|2023-04-25|08:20:47|Brown|United States
Moisturizing lip balm|4|Beauty|t|2023-04-23 13:48:29|2023-04-24|13:48:29|Pink|Canada
Lightweight camera bag|5|Photography|f|2023-04-22 17:10:55|2023-04-24|17:10:55|Black|China
Historical fiction book|3|Books|t|2023-04-21 10:35:40|2023-04-22|10:35:40|Multicolor|United States
Pure honey jar|4|Groceries|t|2023-04-20 15:22:14|2023-04-22|15:22:14|Yellow|Canada
Handcrafted wooden frame|5|Home Decor|f|2023-04-19 08:55:06|2023-04-21|08:55:06|Brown|China
Plush teddy bear|4|Toys|t|2023-04-18 11:40:59|2023-04-19|11:40:59|Brown|United States
Warm woolen sweater|3|Apparel|f|2023-04-17 14:28:37|2023-04-18|14:28:37|Red|Canada"""

MOCK_ITEMS_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("description", T.StringType()),
    T.StructField("rating", T.IntegerType()),
    T.StructField("category", T.StringType()),
    T.StructField("in_stock", T.BooleanType()),
    T.StructField("metadata", T.StringType()),
    T.StructField("created_at", T.TimestampType()),
    T.StructField("last_updated_date", T.DateType()),
    T.StructField("latest_available_time", T.StringType()),
])


def mock_items_pdf() -> pd.DataFrame:
    rows = []
    for i, line in enumerate(_MOCK_ROWS.split("\n"), start=1):
        desc, rating, cat, stock, created, updated, avail, color, loc = line.split("|")
        rows.append({
            "id": i, "description": desc, "rating": int(rating), "category": cat,
            "in_stock": stock == "t",
            "metadata": json.dumps({"color": color, "location": loc}),
            "created_at": dt.datetime.fromisoformat(created),
            "last_updated_date": dt.date.fromisoformat(updated),
            "latest_available_time": avail,
        })
    return pd.DataFrame(rows)


def mock_items(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(mock_items_pdf(), schema=MOCK_ITEMS_SCHEMA)


def mock_items_index_schema() -> IndexSchema:
    """The canonical regress index (expected/topk_scores.out:8-13)."""
    return IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description", tokenizer="default"),
            FieldConfig(name="category", tokenizer="keyword"),
            # json_fields='{"metadata": {"fast": true, "tokenizer":
            # {"type": "raw", "lowercase": true}}}' (topk_scores.out:13)
            FieldConfig(name="metadata", tokenizer="json",
                        tokenizer_opts={"value_tokenizer": "raw"},
                        lowercase=True),
        ])


# (product_id, order_quantity, order_total, customer_name) — the
# reference's Orders regress corpus (test_table.rs:777-844
# mock_orders_data, 64 rows; order_id = SERIAL 1..64).
_MOCK_ORDERS = [
    (1, 3, 99.99, "John Doe"), (2, 1, 49.99, "Jane Smith"),
    (3, 5, 249.95, "Alice Johnson"), (2, 6, 501.87, "John Doe"),
    (7, 10, 361.38, "Jane Smith"), (4, 6, 308.18, "Alice Johnson"),
    (5, 6, 439.05, "Michael Brown"), (8, 3, 104.88, "Emily Davis"),
    (3, 5, 132.75, "Chris Wilson"), (6, 8, 638.73, "Laura Martinez"),
    (1, 7, 633.94, "David White"), (9, 8, 195.11, "Sarah Lewis"),
    (10, 10, 234.32, "Mark Thomas"), (2, 4, 55.41, "Rachel Green"),
    (1, 5, 239.31, "Monica Geller"), (10, 2, 110.06, "Ross Geller"),
    (1, 1, 74.75, "Chandler Bing"), (10, 6, 484.98, "Phoebe Buffay"),
    (8, 9, 319.31, "Joey Tribbiani"), (9, 3, 150.90, "Will Smith"),
    (7, 8, 632.08, "Jada Smith"), (10, 9, 605.18, "Bruce Wayne"),
    (4, 4, 61.25, "Clark Kent"), (2, 7, 258.88, "Diana Prince"),
    (3, 10, 450.57, "Peter Parker"), (9, 7, 102.28, "Tony Stark"),
    (2, 7, 676.15, "Natasha Romanoff"), (9, 5, 237.22, "Steve Rogers"),
    (9, 4, 381.90, "Thor Odinson"), (8, 4, 278.91, "Bruce Banner"),
    (4, 5, 402.69, "Wanda Maximoff"), (8, 2, 91.16, "Vision"),
    (3, 9, 194.87, "Scott Lang"), (5, 9, 431.54, "Hope Van Dyne"),
    (9, 7, 361.38, "Jane Smith"), (4, 6, 308.18, "Alice Johnson"),
    (5, 6, 439.05, "Michael Brown"), (8, 3, 104.88, "Emily Davis"),
    (3, 5, 132.75, "Chris Wilson"), (6, 8, 638.73, "Laura Martinez"),
    (1, 7, 633.94, "David White"), (9, 8, 195.11, "Sarah Lewis"),
    (10, 10, 234.32, "Mark Thomas"), (2, 4, 55.41, "Rachel Green"),
    (1, 5, 239.31, "Monica Geller"), (10, 2, 110.06, "Ross Geller"),
    (1, 1, 74.75, "Chandler Bing"), (10, 6, 484.98, "Phoebe Buffay"),
    (8, 9, 319.31, "Joey Tribbiani"), (9, 3, 150.90, "Will Smith"),
    (7, 8, 632.08, "Jada Smith"), (10, 9, 605.18, "Bruce Wayne"),
    (4, 4, 61.25, "Clark Kent"), (2, 7, 258.88, "Diana Prince"),
    (3, 10, 450.57, "Peter Parker"), (9, 7, 102.28, "Tony Stark"),
    (2, 7, 676.15, "Natasha Romanoff"), (9, 5, 237.22, "Steve Rogers"),
    (9, 4, 381.90, "Thor Odinson"), (8, 4, 278.91, "Bruce Banner"),
    (4, 5, 402.69, "Wanda Maximoff"), (8, 2, 91.16, "Vision"),
    (3, 9, 194.87, "Scott Lang"), (5, 9, 431.54, "Hope Van Dyne"),
]

MOCK_ORDERS_SCHEMA = T.StructType([
    T.StructField("order_id", T.IntegerType(), False),
    T.StructField("product_id", T.IntegerType(), False),
    T.StructField("order_quantity", T.IntegerType(), False),
    T.StructField("order_total", T.DoubleType(), False),
    T.StructField("customer_name", T.StringType(), False),
])


def mock_orders_pdf() -> pd.DataFrame:
    return pd.DataFrame([
        {"order_id": i, "product_id": p, "order_quantity": q,
         "order_total": t, "customer_name": c}
        for i, (p, q, t, c) in enumerate(_MOCK_ORDERS, start=1)
    ])


def mock_orders(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(mock_orders_pdf(),
                                 schema=MOCK_ORDERS_SCHEMA)


# ---------------------------------------------------------------------------
# transcripts — deterministic synthetic agent-conversation stream
# ---------------------------------------------------------------------------

_VOCAB_COMMON = (
    "the a of to and in for with on run check result error token stream data "
    "search query index score join table file read write plan task agent user "
    "model code test build batch state key value time event window commit"
).split()
_VOCAB_RARE = (
    "zephyr quasar obsidian krypton nimbus paradox vortex catalyst tungsten "
    "icicle meridian sapphire"
).split()
_TOOLS = ["bash", "python", "search", "browser", "editor", None, None, None]
_ROLES = ["user", "assistant", "assistant", "tool"]
_EPOCH = dt.datetime(2026, 1, 1)

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def turn_text(seed: int, conv_id: str, turn_idx: int) -> str:
    """Regenerate a turn's text purely from (seed, conv_id, turn_idx).

    This function IS the per-row invariant oracle: any row the engine
    emits must have text equal to this reconstruction.
    """
    h = hashlib.sha256(f"{seed}|{conv_id}|{turn_idx}".encode()).digest()
    rng = random.Random(int.from_bytes(h[:8], "big"))
    n = rng.randint(3, 24)
    words = []
    for _ in range(n):
        r = rng.random()
        if r < 0.015:
            words.append(rng.choice(_VOCAB_RARE))
        else:
            # Zipf-ish: rank ~ 1/(r) over the common vocab
            idx = min(int(len(_VOCAB_COMMON) * (rng.random() ** 2)),
                      len(_VOCAB_COMMON) - 1)
            words.append(_VOCAB_COMMON[idx])
    return " ".join(words)


def transcripts_pdf(n_convs: int = 50, seed: int = 7,
                    late_fraction: float = 0.1) -> pd.DataFrame:
    """Deterministic transcript corpus; a ``late_fraction`` of events get a
    delayed ts (out-of-order arrival) to exercise watermark semantics."""
    rows = []
    for c in range(n_convs):
        rows.extend(conv_rows(seed, c, late_fraction))
    return pd.DataFrame(rows)


def transcripts(spark: SparkSession, n_convs: int = 50, seed: int = 7,
                late_fraction: float = 0.1) -> DataFrame:
    return spark.createDataFrame(
        transcripts_pdf(n_convs, seed, late_fraction), schema=TRANSCRIPTS_SCHEMA)


def conv_rows(seed: int, c: int, late_fraction: float = 0.1) -> list:
    """All rows of one conversation (deterministic in (seed, c))."""
    conv_id = f"conv-{seed}-{c:05d}"
    rng = random.Random((seed << 20) ^ c)
    n_turns = rng.randint(2, 50)
    base = _EPOCH + dt.timedelta(minutes=c * 7)
    rows = []
    for t in range(n_turns):
        role = _ROLES[rng.randrange(len(_ROLES))]
        tool = rng.choice(_TOOLS) if role == "tool" else None
        ts = base + dt.timedelta(seconds=t * 20)
        if rng.random() < late_fraction:
            ts += dt.timedelta(seconds=rng.randint(30, 240))
        rows.append({"conv_id": conv_id, "turn_idx": t, "role": role,
                     "text": turn_text(seed, conv_id, t), "tool": tool,
                     "ts": ts})
    return rows


def transcripts_distributed(spark: SparkSession, n_convs: int, seed: int = 7,
                            late_fraction: float = 0.1,
                            partitions: int = 32) -> DataFrame:
    """Generate the transcript corpus ON THE EXECUTORS (mapInPandas over
    conversation ids) — same rows as :func:`transcripts`, but parallel, so
    large bench corpora don't bottleneck on the driver."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for c in pdf["id"]:
                rows.extend(conv_rows(seed, int(c), late_fraction))
            yield pd.DataFrame(rows)

    return (spark.range(n_convs).repartition(partitions)
            .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA))


def transcripts_index_schema() -> IndexSchema:
    return IndexSchema(
        key_field="doc_id",  # = conv_id || '#' || turn_idx, added by indexer
        text_fields=[FieldConfig(name="text", tokenizer="default")])
