"""Streamed-vs-batch differential fuzzing of the continuous indexer.

Property (north_star invariant): for ANY arrival order whose event-time
disorder is bounded below the watermark, and ANY micro-batch chunking,
the streamed segmented index is posting-identical to a batch build over
the distinct corpus — bounded disorder never loses, duplicates, or
reorders data (per-turn text equality under stable turn ordering).

Soundness of the bound: rows arrive sorted by ``ts + jitter`` with
``jitter <= J``; for any already-seen row s and not-yet-arrived row r,
``ts(s) <= ts(r) + J``, so the watermark ``max_seen_ts - W`` can never
pass r's event time while it is still in flight when ``W > J``
(here J = 2 min, W = 10 min).  Injected duplicates arrive within the
same bound, so dropDuplicatesWithinWatermark still holds their state.

Ref: the reference's aminsert/ambuild equivalence (streamed micro-batch
segments vs bulk build) — pg_search regress exercises it via INSERT
after CREATE INDEX; here the arrival order itself is fuzzed.
"""

import glob
import os
import random
import shutil

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sparksearch import build_index
from sparksearch.fixtures import TRANSCRIPTS_SCHEMA, transcripts_pdf
from sparksearch.streaming.indexer import StreamingIndexer, open_segmented_index
from tests.test_streaming import _postings_set, _read_stream, _turn_schema


def _arrival_files(spark, tdir, seed: int):
    """Corpus + bounded-disorder arrival order + random chunking."""
    rng = random.Random(9000 + seed)
    pdf = transcripts_pdf(n_convs=rng.randint(15, 30), seed=seed,
                          late_fraction=0.0)
    # inject duplicate arrivals of ~5% of turns (same natural key)
    dups = pdf.sample(frac=0.05, random_state=seed)
    arrivals = pdf if dups.empty else pd.concat([pdf, dups])
    # bounded jitter: J = 120 s < W = 600 s
    arrivals = arrivals.reset_index(drop=True)
    jit = arrivals.apply(
        lambda r: random.Random(
            f"{seed}|{r['conv_id']}|{r['turn_idx']}|{r.name}"
        ).uniform(0, 120), axis=1)
    arrivals = arrivals.assign(
        _arr=arrivals["ts"] + pd.to_timedelta(jit, unit="s"))
    arrivals = arrivals.sort_values("_arr").drop(columns="_arr") \
                       .reset_index(drop=True)

    flat = f"{tdir}/flat{seed}"
    os.makedirs(flat, exist_ok=True)
    parts = rng.randint(2, 5)
    chunk = (len(arrivals) + parts - 1) // parts
    base_mtime = 1_700_000_000
    n = 0
    for i in range(parts):
        part = arrivals.iloc[i * chunk:(i + 1) * chunk]
        if part.empty:
            continue
        stage = f"{tdir}/stage{seed}_{i}"
        spark.createDataFrame(part, schema=TRANSCRIPTS_SCHEMA) \
            .coalesce(1).write.mode("overwrite").parquet(stage)
        for p in sorted(glob.glob(f"{stage}/*.parquet")):
            dst = f"{flat}/part{n:03d}.parquet"
            shutil.copy(p, dst)
            os.utime(dst, (base_mtime + n, base_mtime + n))
            n += 1
    return flat, pdf


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606])
def test_streamed_equals_batch_under_bounded_disorder(spark, tmp_path, seed):
    tdir = str(tmp_path)
    flat, pdf = _arrival_files(spark, tdir, seed)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt,
                          watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()

    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    batch_docs = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA) \
        .withColumn("doc_id", F.concat_ws(
            "#", "conv_id", F.col("turn_idx").cast("string")))
    bidx = build_index(batch_docs, _turn_schema())

    assert _postings_set(sidx.postings) == _postings_set(bidx.postings), \
        f"seed {seed}: streamed postings diverge from batch build"
    assert sidx.meta == bidx.meta, f"seed {seed}: corpus stats diverge"
