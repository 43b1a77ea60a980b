"""Session-window assembly of conversation-scoped documents.

North-star requirement: session windows over ``conv_id`` with event-time
watermarks on ``ts`` assemble conversation documents in **stable turn
order** — ordered by ``turn_idx``, never by arrival order, so
out-of-order/late events (within the watermark) land in the right place.

Reference analog: ParadeDB has no streaming sessions; the conversation-
scoped document corresponds to indexing a GROUP BY key_field rollup
(SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def conversation_docs(turns_with_watermark: DataFrame,
                      gap: str = "5 minutes") -> DataFrame:
    """turns (already watermarked) → one doc per (conv_id, session window).

    Output: doc_id, conv_id, session_start, session_end, n_turns, text
    (turn texts joined in turn_idx order), roles, first_ts, last_ts.
    Emitted in append mode when the session closes (watermark passes).
    """
    agg = (turns_with_watermark
           .groupBy(F.session_window("ts", gap), F.col("conv_id"))
           .agg(F.count("*").alias("n_turns"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
                F.sort_array(F.collect_list(F.struct(
                    F.col("turn_idx"), F.col("role"), F.col("text")))).alias("turns")))
    return agg.select(
        F.concat_ws("#", "conv_id",
                    F.unix_timestamp(F.col("session_window.start")).cast("string")
                    ).alias("doc_id"),
        "conv_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_turns", "first_ts", "last_ts",
        F.concat_ws(" ", F.transform("turns", lambda s: s["text"])).alias("text"),
        F.transform("turns", lambda s: s["role"]).alias("roles"),
        F.transform("turns", lambda s: s["turn_idx"]).alias("turn_idxs"))


def conversation_docs_batch(turns: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Batch-mode oracle for :func:`conversation_docs`: lag/cumsum
    sessionization (same semantics, usable on static data and in tests)."""
    from pyspark.sql import Window as W
    w = W.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gapped = (F.unix_timestamp("ts")
              - F.unix_timestamp(F.lag("ts").over(w))) > gap_seconds
    d = (turns
         .withColumn("new_s", F.when(gapped | F.lag("ts").over(w).isNull(), 1)
                     .otherwise(0))
         .withColumn("sess", F.sum("new_s").over(
             w.rowsBetween(W.unboundedPreceding, 0))))
    agg = (d.groupBy("conv_id", "sess")
           .agg(F.count("*").alias("n_turns"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
                F.sort_array(F.collect_list(F.struct(
                    F.col("turn_idx"), F.col("role"), F.col("text")))).alias("turns")))
    return agg.select(
        F.concat_ws("#", "conv_id",
                    F.unix_timestamp("first_ts").cast("string")).alias("doc_id"),
        "conv_id", "n_turns", "first_ts", "last_ts",
        F.concat_ws(" ", F.transform("turns", lambda s: s["text"])).alias("text"),
        F.transform("turns", lambda s: s["role"]).alias("roles"),
        F.transform("turns", lambda s: s["turn_idx"]).alias("turn_idxs"))
