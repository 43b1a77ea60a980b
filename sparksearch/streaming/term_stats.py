"""Stateful per-term document-frequency / term-frequency aggregation,
keyed by SALTED token (north-star: applyInPandasWithState maintains
per-term posting/DF state keyed by salted token to defeat skew).

Zipfian tokens ("the", "a") would hot-spot a per-term state key; salting
splits each term's state across N_SALT buckets keyed by
``term#hash(doc) % N_SALT`` (two-level aggregation: per-salt running
state in the state store, salt-bucket merge at read).

Reference analog: the LSM maintains per-segment postings and doc-freqs
incrementally and merges them at query time (merge_policy.rs,
reader/index.rs) — here the state store holds the running (df, tf) per
salted term and each trigger emits the updated rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               IntegerType)
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = StructType([
    StructField("salted", StringType()),
    StructField("term", StringType()),
    StructField("salt", IntegerType()),
    StructField("df", LongType()),
    StructField("tf", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("df", LongType()),
    StructField("tf", LongType()),
    StructField("bloom", StringType()),  # hex bloom of seen doc_ids (opt.)
])

# bloom sizing: with doc-salted keys each bucket sees df/n_salt docs;
# 8192 bits / 3 hashes keeps FP < 1% up to ~800 docs per bucket — beyond
# that df gradually UNDER-counts (never over), the safe direction for idf
_BLOOM_BITS = 8192
_BLOOM_K = 3


def _bloom_positions(doc_id: str):
    import hashlib
    h = hashlib.blake2b(str(doc_id).encode(), digest_size=16).digest()
    v = int.from_bytes(h, "big")
    for i in range(_BLOOM_K):
        yield (v >> (i * 20)) % _BLOOM_BITS


def _make_update(dedup_docs: str):
    def _update(key, pdfs, state):
        df0, tf0, bloom_hex = state.get if state.exists else (0, 0, "")
        tf = 0
        if dedup_docs == "bloom":
            # cross-batch doc REPLAY dedup: a doc that re-arrives in a
            # later micro-batch contributes neither df nor tf — both
            # counters admit each doc exactly once, so (df, tf) stay
            # mutually consistent under replays.  Replay-safety requires
            # dedup across BATCHES only, so a doc's tf is first summed
            # across every arrow chunk of THIS batch (pdfs is an iterator
            # of chunked frames; one group's rows may straddle chunks)
            # and the bloom membership test runs once per doc — a chunk
            # boundary can never split a doc's contribution.
            bloom = int(bloom_hex or "0", 16)
            new = 0
            batch_tf: dict = {}
            for pdf in pdfs:
                for d, t_ in pdf.groupby("doc_id")["tf"].sum().items():
                    batch_tf[d] = batch_tf.get(d, 0) + int(t_)
            for d, t_ in batch_tf.items():
                pos = list(_bloom_positions(d))
                if not all((bloom >> p) & 1 for p in pos):
                    new += 1
                    tf += t_
                    for p in pos:
                        bloom |= 1 << p
            df0, tf0 = df0 + new, tf0 + tf
            state.update((df0, tf0, f"{bloom:x}"))
        else:
            # "batch" mode PRECONDITION: every document's tokens arrive
            # within one micro-batch (true for the engine's own pipeline,
            # which dedups turns within the watermark before exploding) —
            # per-batch distinct doc counts are then exact
            seen = set()
            for pdf in pdfs:
                seen.update(pdf["doc_id"].values)
                tf += int(pdf["tf"].sum())
            df0, tf0 = df0 + len(seen), tf0 + tf
            state.update((df0, tf0, ""))
        salted = key[0]
        term, _, salt = salted.rpartition("#")
        yield pd.DataFrame([{"salted": salted, "term": term,
                             "salt": int(salt), "df": df0, "tf": tf0}])
    return _update


def salted_term_stats(turns_with_watermark: DataFrame, field_cfg,
                      n_salt: int = 8,
                      dedup_docs: str = "batch") -> DataFrame:
    """turns stream → per-(term, salt) running (df, tf), updated per trigger.

    Input must carry ``conv_id``, ``turn_idx`` and the text column named by
    ``field_cfg.name``.  Output rows are per salted key; merge salt buckets
    with ``groupBy(term).sum(df, tf)`` downstream (see
    :func:`merge_salted_stats`).

    ``dedup_docs``: ``"batch"`` (default) counts per-batch distinct docs —
    exact under the PRECONDITION that each doc's tokens arrive in one
    micro-batch (the engine's own pipeline guarantees it via
    dropDuplicatesWithinWatermark before exploding); ``"bloom"`` keeps a
    per-key bloom of seen doc_ids in state and admits each doc's (df AND
    tf) contribution exactly once, so REPLAYED docs never double-count
    either counter (slight UNDER-count possible at extreme per-bucket
    cardinality — the safe direction for idf).
    """
    from sparksearch.analysis import flat_token_array_expr, analyzer_expr
    name = field_cfg.name
    flat = flat_token_array_expr(F.col(name), field_cfg)
    if flat is None:
        flat = F.transform(analyzer_expr(F.col(name), field_cfg),
                           lambda s: s["t"])
    doc_id = F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    toks = (turns_with_watermark
            .select(doc_id.alias("doc_id"), F.col("ts"),
                    F.explode(flat).alias("term"))
            .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salt)))
            .withColumn("salted", F.concat_ws("#", "term",
                                              F.col("salt").cast("string")))
            .withColumn("tf", F.lit(1).cast("long")))
    return (toks.groupBy("salted")
            .applyInPandasWithState(_make_update(dedup_docs), OUTPUT_SCHEMA,
                                    STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))


def merge_salted_stats(stats: DataFrame) -> DataFrame:
    """Second aggregation level: collapse salt buckets per term."""
    return (stats.groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("tf").alias("tf")))
