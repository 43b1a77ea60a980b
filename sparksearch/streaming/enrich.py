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
                             bound_seconds: int = 120,
                             bucketed: bool = False) -> DataFrame:
    """Join non-tool turns with tool-call turns of the same conversation
    whose event time falls within [ts - bound, ts] (the tool call that
    most recently preceded — or coincides with — the turn).

    Both sides are watermarked; the join condition bounds tool_ts relative
    to ts, so Spark can prune join state (no unbounded buffering).
    Output: left turn columns + tool, tool_turn_idx, tool_ts (one row per
    matching tool event; consumers may take the latest per turn).

    ``bucketed=True`` (batch only) runs the same semantics through a
    TIME-BUCKETED equi-join (guide §3): both sides bucketed by
    floor(epoch/bound), joined on (conv_id, bucket) over the turn's two
    candidate buckets, the exact original bound as a residual filter —
    row-identical output (tests/test_streaming.py pins it against
    enrich_batch_oracle).  It bounds per-turn probe work by the tools
    of two adjacent windows instead of the WHOLE conversation, so it
    pays when conversations are long relative to the window; on the
    contract corpus (~13 tool calls/conversation) the plain
    conv_id-keyed broadcast join measured FASTER (0.79 s vs 1.73 s
    noop-sink at 1M events) — the round-6 A/B kept the plain join as
    the default and this twin opt-in.  The streaming path always keeps
    the verbatim time-bound join — that bound is what lets Spark prune
    join state.
    """
    if bucketed and not turns.isStreaming:
        return _enrich_batch_bucketed(turns, bound_seconds)
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


def _enrich_batch_bucketed(turns: DataFrame, bound_seconds: int) -> DataFrame:
    """Batch twin of the watermarked join — identical output, bucketed
    probe sets.

    Exactness: for any real t, floor(t/B) computed on floor-to-second
    epochs equals floor(t/B) (B a positive integer), and
    tool_ts ∈ [ts − B, ts] implies bucket(tool_ts) ∈ {bucket(ts) − 1,
    bucket(ts)} (floor((t−B)/B) = floor(t/B) − 1), so the two-candidate
    equi-join + residual filter finds exactly the original matches.
    Left-outer recovery joins on (conv_id, ts): the match SET is a
    function of (conv_id, ts) alone, so per-row multiplicities are
    preserved for any input multiset."""
    base = turns.filter(F.col("role") != "tool").drop("tool")
    tools = (turns.filter(F.col("role") == "tool")
             .select(F.col("conv_id").alias("t_conv_id"),
                     F.col("turn_idx").alias("tool_turn_idx"),
                     F.col("tool"),
                     F.col("ts").alias("tool_ts")))
    b = int(bound_seconds)
    tools_b = tools.withColumn(
        "_tb", F.floor(F.unix_timestamp("tool_ts") / b))
    base_b = base.withColumn(
        "_tb0", F.floor(F.unix_timestamp("ts") / b))
    cand = base_b.withColumn(
        "_tb", F.explode(F.array(F.col("_tb0"), F.col("_tb0") - 1)))
    residual = ((cand["ts"] >= tools_b["tool_ts"])
                & (tools_b["tool_ts"]
                   >= cand["ts"] - F.expr(f"INTERVAL {b} SECONDS")))
    inner = (cand.join(
        tools_b,
        (cand["conv_id"] == tools_b["t_conv_id"])
        & (cand["_tb"] == tools_b["_tb"]) & residual,
        "inner").drop("_tb", "_tb0", "t_conv_id"))
    out_cols = base.columns + ["tool_turn_idx", "tool", "tool_ts"]
    inner = inner.select(*out_cols)
    matched = inner.select("conv_id", "ts").distinct()
    tdtypes = dict(tools.dtypes)
    unmatched = base.join(matched, ["conv_id", "ts"], "left_anti").select(
        *base.columns,
        F.lit(None).cast(tdtypes["tool_turn_idx"]).alias("tool_turn_idx"),
        F.lit(None).cast(tdtypes["tool"]).alias("tool"),
        F.lit(None).cast(tdtypes["tool_ts"]).alias("tool_ts"))
    return inner.unionByName(unmatched)


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
