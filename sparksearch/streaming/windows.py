"""Tumbling / sliding term-frequency aggregates over the transcript stream
(north_star: "tumbling/sliding term-frequency aggregates").

Reference analog: histogram/date_histogram aggregations over a time fast
field (SURVEY.md §2.7) — restated as watermarked event-time windows.

Skew note: the (window, term) grouping meets Zipfian keys, but Spark's
partial aggregation collapses each micro-batch's updates map-side before
they reach the (window, term) state entry, so hot terms cost one state row
— no salting needed for pure counts (salting matters for the stateful
posting-list builder, see term_stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparksearch.analysis import flat_token_array_expr, analyzer_expr


def _token_stream(turns: DataFrame, field_cfg) -> DataFrame:
    name = field_cfg.name
    flat = flat_token_array_expr(F.col(name), field_cfg)
    if flat is None:
        flat = F.transform(analyzer_expr(F.col(name), field_cfg),
                           lambda s: s["t"])
    return turns.select("ts", F.explode(flat).alias("term"))


def term_frequency_windows(turns_with_watermark: DataFrame, field_cfg,
                           window: str = "5 minutes",
                           slide: str | None = None) -> DataFrame:
    """Per-(window, term) term frequency + distinct-ish doc spread.

    ``slide=None`` → tumbling; otherwise sliding windows every ``slide``.
    Works identically on a static DataFrame (batch oracle in tests).

    The window struct is computed per TURN, before the token explode
    (round-6, guide §2.3: the Generate then copies one struct pointer
    per token instead of redoing the window arithmetic + struct
    allocation per token row — ~|tokens|/|turns| ≈ 50× fewer window
    evaluations; output bit-identical for tumbling AND sliding, both
    pinned equal in the session A/B and by the streamed≡batch tests).
    """
    name = field_cfg.name
    flat = flat_token_array_expr(F.col(name), field_cfg)
    if flat is None:
        flat = F.transform(analyzer_expr(F.col(name), field_cfg),
                           lambda s: s["t"])
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    base = turns_with_watermark.select(win.alias("w"), flat.alias("__tk"))
    toks = base.select("w", F.explode("__tk").alias("term"))
    return (toks.groupBy("w", "term")
            .agg(F.count("*").alias("tf"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "term", "tf"))


def top_terms_per_window(tf_windows: DataFrame, k: int = 10) -> DataFrame:
    """Batch post-processing: top-k terms of each window by tf."""
    from pyspark.sql import Window as W
    w = (W.partitionBy("window_start")
         .orderBy(F.col("tf").desc(), F.col("term").asc()))
    return (tf_windows.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))
