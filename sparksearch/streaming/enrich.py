"""Stateful stream-stream join: enrich turns with tool-call context.

North-star: "a stateful stream-stream join that enriches turns with
tool-call context".  Reference analog: JoinScan enrichment joins search
hits with a dimension table (customscan/joinscan/) — restated here as a
watermarked event-time-bounded join, the canonical Structured Streaming
stateful join (state pruned by the time bound + watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_with_tool_context(turns: DataFrame,
                             watermark: str = "2 minutes",
                             bound_seconds: int = 120) -> DataFrame:
    """Join non-tool turns with tool-call turns of the same conversation
    whose event time falls within [ts - bound, ts] (the tool call that
    most recently preceded — or coincides with — the turn).

    Both sides are watermarked; the join condition bounds tool_ts relative
    to ts, so Spark can prune join state (no unbounded buffering).
    Output: left turn columns + tool, tool_turn_idx, tool_ts (one row per
    matching tool event; consumers may take the latest per turn).
    """
    base = (turns.filter(F.col("role") != "tool")
            .drop("tool")   # null for non-tool roles; right side supplies it
            .withWatermark("ts", watermark))
    tools = (turns.filter(F.col("role") == "tool")
             .select(F.col("conv_id").alias("t_conv_id"),
                     F.col("turn_idx").alias("tool_turn_idx"),
                     F.col("tool"),
                     F.col("ts").alias("tool_ts"))
             .withWatermark("tool_ts", watermark))
    cond = ((base["conv_id"] == tools["t_conv_id"])
            & (tools["tool_ts"] >= base["ts"] - F.expr(f"INTERVAL {bound_seconds} SECONDS"))
            & (tools["tool_ts"] <= base["ts"]))
    return (base.join(tools, cond, "leftOuter")
            .drop("t_conv_id"))


def enrich_batch_oracle(turns: DataFrame, bound_seconds: int = 120) -> DataFrame:
    """Batch-mode oracle with identical semantics for tests."""
    base = turns.filter(F.col("role") != "tool").drop("tool")
    tools = (turns.filter(F.col("role") == "tool")
             .select(F.col("conv_id").alias("t_conv_id"),
                     F.col("turn_idx").alias("tool_turn_idx"),
                     F.col("tool"), F.col("ts").alias("tool_ts")))
    cond = ((base["conv_id"] == tools["t_conv_id"])
            & (tools["tool_ts"] >= base["ts"] - F.expr(f"INTERVAL {bound_seconds} SECONDS"))
            & (tools["tool_ts"] <= base["ts"]))
    return base.join(tools, cond, "leftOuter").drop("t_conv_id")
