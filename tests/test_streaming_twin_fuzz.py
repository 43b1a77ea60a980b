"""Differential fuzz for the streaming-twin operators: randomized
window/slide geometries for term_frequency_windows and randomized time
bounds for enrich_with_tool_context, each checked against an
INDEPENDENT pure-pandas oracle (the contract entries pin one geometry
each; this layer proves the operators across the parameter space).

Window-alignment oracle: Spark's ``F.window(ts, w, s)`` assigns an event
at epoch second t to every window start w0 with w0 ≡ 0 (mod s) and
w0 ≤ t < w0 + w — i.e. starts s·⌊t/s⌋ − j·s for j = 0..(w/s − 1) that
satisfy w0 > t − w (Spark SQL TimeWindow semantics, origin 1970 UTC).
"""

import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sparksearch.schema import FieldConfig
from sparksearch.streaming.enrich import enrich_with_tool_context
from sparksearch.streaming.windows import (term_frequency_windows,
                                           top_terms_per_window)

VOCAB = ["data", "join", "spark", "stream", "window", "agg", "scan",
         "merge", "sort", "hash"]

# epoch seconds of 2026-01-01 00:00:00 UTC (multiple of 3600 — every
# fuzzed slide below divides it, so bucket arithmetic stays exact)
TS0 = 1767225600


def _gen_turns(rng: random.Random, n: int) -> pd.DataFrame:
    rows = []
    for i in range(n):
        t = TS0 + rng.randrange(0, 3600)
        text = " ".join(rng.choice(VOCAB)
                        for _ in range(rng.randrange(1, 6)))
        rows.append({"off": t - TS0,
                     "ts": pd.Timestamp(t, unit="s"),
                     "text": text})
    return pd.DataFrame(rows)


def _window_starts(t: int, w: int, s: int) -> list[int]:
    base = (t // s) * s
    return [base - j * s for j in range(w // s) if base - j * s > t - w]


def _tf_oracle(pdf: pd.DataFrame, w: int, s: int, k: int) -> pd.DataFrame:
    rows = []
    for _, r in pdf.iterrows():
        t = TS0 + int(r["off"])
        for term in r["text"].split():
            for w0 in _window_starts(t, w, s):
                rows.append((w0, term))
    tf = (pd.DataFrame(rows, columns=["w0", "term"])
          .groupby(["w0", "term"]).size().reset_index(name="tf"))
    tf = tf.sort_values(["w0", "tf", "term"],
                        ascending=[True, False, True])
    top = tf.groupby("w0").head(k)
    return top.reset_index(drop=True)


@pytest.mark.parametrize("seed", range(12))
def test_tf_windows_random_geometry(spark, seed):
    rng = random.Random(8100 + seed)
    slide = rng.choice([30, 60, 90, 120, 150])
    mult = rng.randrange(1, 5)          # window = slide * mult
    w = slide * mult
    tumbling = mult == 1 and rng.random() < 0.5
    k = rng.randrange(1, 4)
    pdf = _gen_turns(rng, rng.randrange(20, 120))
    turns = spark.createDataFrame(pdf[["ts", "text"]])
    cfg = FieldConfig(name="text", tokenizer="simple")
    tf = term_frequency_windows(
        turns, cfg, window=f"{w} seconds",
        slide=None if tumbling else f"{slide} seconds")
    got = (top_terms_per_window(tf, k=k)
           .withColumn("w0", F.unix_timestamp("window_start"))
           .select("w0", "term", "tf").toPandas()
           .sort_values(["w0", "tf", "term"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    want = _tf_oracle(pdf, w, w if tumbling else slide, k)
    ctx = f"seed={seed} w={w} slide={slide} tumbling={tumbling} k={k}"
    assert len(got) == len(want), ctx
    # top-k tie SETS can differ only in which equal-tf term survives;
    # top_terms_per_window breaks ties by term asc — same as the oracle,
    # so the frames must be identical
    pd.testing.assert_frame_equal(
        got.astype({"w0": "int64", "tf": "int64"}),
        want.astype({"w0": "int64", "tf": "int64"}),
        check_names=False, obj=ctx)


def _gen_transcript(rng: random.Random, n: int) -> pd.DataFrame:
    rows = []
    for i in range(n):
        role = rng.choice(["user", "assistant", "tool", "tool"])
        rows.append({
            "conv_id": f"c{rng.randrange(1, 6)}",
            "turn_idx": i,
            "role": role,
            "tool": f"t{rng.randrange(3)}" if role == "tool" else None,
            "off": rng.randrange(0, 1200),
        })
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(TS0 + pdf["off"], unit="s")
    return pdf


def _enrich_oracle(pdf: pd.DataFrame, bound: int) -> pd.DataFrame:
    base = pdf[pdf["role"] != "tool"][["conv_id", "turn_idx", "role", "off"]]
    tools = pdf[pdf["role"] == "tool"][["conv_id", "turn_idx", "tool", "off"]]
    tools = tools.rename(columns={"turn_idx": "tool_turn_idx",
                                  "off": "tool_off"})
    m = base.merge(tools, on="conv_id", how="left")
    keep = (m["tool_off"].isna()
            | ((m["tool_off"] >= m["off"] - bound)
               & (m["tool_off"] <= m["off"])))
    m = m[keep]
    # left-outer: base rows whose every candidate was filtered out must
    # reappear as a single null-extended row
    matched = set(m.loc[m["tool_off"].notna(), "turn_idx"]) | \
        set(m.loc[m["tool_off"].isna(), "turn_idx"])
    lost = base[~base["turn_idx"].isin(matched)].copy()
    for c in ("tool_turn_idx", "tool", "tool_off"):
        lost[c] = None
    out = pd.concat([m[m["tool_off"].notna()],
                     m[m["tool_off"].isna()], lost], ignore_index=True)
    return (out.sort_values(["turn_idx", "tool_turn_idx"],
                            na_position="last")
            .reset_index(drop=True))


@pytest.mark.parametrize("seed", range(12))
def test_enrich_random_bounds(spark, seed):
    rng = random.Random(8200 + seed)
    bound = rng.choice([30, 60, 120, 300, 600])
    pdf = _gen_transcript(rng, rng.randrange(30, 150))
    turns = spark.createDataFrame(
        pdf[["conv_id", "turn_idx", "role", "tool", "ts"]])
    got = (enrich_with_tool_context(turns, bound_seconds=bound)
           .withColumn("tool_off",
                       F.unix_timestamp("tool_ts") - F.lit(TS0))
           .select("conv_id", "turn_idx", "role", "tool_turn_idx",
                   "tool", "tool_off")
           .toPandas()
           .sort_values(["turn_idx", "tool_turn_idx"], na_position="last")
           .reset_index(drop=True))
    want = _enrich_oracle(pdf, bound)[
        ["conv_id", "turn_idx", "role", "tool_turn_idx", "tool",
         "tool_off"]].reset_index(drop=True)
    ctx = f"seed={seed} bound={bound}"
    assert len(got) == len(want), (ctx, len(got), len(want))

    def canon(df):
        rows = ((r.conv_id, int(r.turn_idx), r.role,
                 None if pd.isna(r.tool_turn_idx) else int(r.tool_turn_idx),
                 None if pd.isna(r.tool) else str(r.tool),
                 None if pd.isna(r.tool_off) else int(r.tool_off))
                for r in df.itertuples())
        return sorted(tuple("~" if v is None else str(v) for v in r)
                      for r in rows)
    assert canon(got) == canon(want), ctx
