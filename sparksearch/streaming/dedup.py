"""Streaming near-duplicate detection: ingest-time MinHash+LSH dedup.

Batch dedup (pipeline/dedup.py) answers "which docs in this corpus are
near-dups"; a continuous ingest pipeline needs the streaming twin:
"is this arriving doc a near-dup of anything seen so far" — the shape a
10^12-turn transcript stream requires, where re-running an all-corpus
LSH join per micro-batch is impossible.

Design (north-star analog: applyInPandasWithState keyed by salted token
— here keyed by LSH band bucket):

- Every arriving doc is MinHash-signed by the SAME codegen'd expression
  chain as the batch path (``minhash_signatures``), then exploded to its
  ``bands`` LSH bucket keys (``band_hashes`` — the identical routing the
  batch join buckets on).
- ``applyInPandasWithState`` keyed by ``(band, bh)`` holds the bucket's
  member signatures (the streaming dedup "index": ~8·n_hashes bytes per
  member — the signature store IS the state, exactly what a batch LSH
  join would shuffle).  Each new member is compared against the bucket's
  members (estimated Jaccard = signature agreement rate) and appended.
- CROSS-BAND pair dedup without a second stateful stage: a colliding
  pair meets in every band whose signature slices agree, so each bucket
  emits the pair only if ITS band is the smallest agreeing band —
  exactly-one emission, decided locally from the two signatures (no
  shuffle, no distinct()).
- REPLAY idempotence: a doc id already in the bucket's member list is
  skipped entirely — neither re-emitted nor re-counted — so micro-batch
  replays after failure cannot duplicate pairs (the sink-side analog of
  the indexer's epoch-keyed segments).
- SKEW: boilerplate near-identical docs all land in the same buckets;
  ``max_members`` caps the per-bucket state and per-arrival work.  A doc
  arriving at a full bucket is still compared (pairs emitted) but its
  SIGNATURE is not stored, so the cap bounds cost at O(max_members) per
  arrival with a documented recall trade beyond it.  Its id IS recorded
  (``overflow_ids`` state field, ~8 B/doc), so replayed micro-batches
  skip it and exactly-once emission holds even at the cap.  Batch
  parity holds exactly while every bucket stays under the cap.

Parity with the batch path is exact modulo one negligible case: the
batch join admits xxhash64 band-hash collisions as candidates; the
streaming emitter requires the band SLICES to agree (hash equality
without slice equality — p ≈ 2^-64 per band pair — is dropped).

State never expires (NoTimeout): the member store is the dedup index
itself.  At cluster scale, bound it the way the batch corpus would be —
key the stream by corpus epoch, or add a GroupStateTimeout eviction if
only a rolling window of history must be matched.

WARM START against an existing corpus: play the corpus files through
the stream source FIRST (a file source orders batches by mtime), then
let live arrivals follow — the corpus docs populate bucket state and
their replay is idempotent, so a restart from checkpoint never
double-emits.  Corpus-vs-corpus pairs emitted during the warm-up are
the batch dedup result and can be kept or discarded downstream.  The
batch-side twin of this state store is ``pipeline.dedup.SigIndex``
(same signatures, persisted + partition-pruned).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StructField,
                               StructType)


def streaming_near_duplicates(docs: DataFrame, key: str,
                              text_col: str = "text",
                              threshold: float = 0.7, n_hashes: int = 64,
                              bands: int = 16, shingle_k: int = 3,
                              seed: int = 13, max_members: int = 512,
                              output_mode: str = "update",
                              overflow_cap: int | None = None) -> DataFrame:
    """(a, b, est_jaccard) pairs, emitted as docs arrive; the streamed
    twin of :func:`sparksearch.pipeline.dedup.minhash_near_duplicates`
    (identical parameters → identical pair set, proven in
    tests/test_streaming.py).

    CHECKPOINT COMPATIBILITY (r5 ADVICE): the state schema gained the
    ``overflow_ids`` field in round 5 — Structured Streaming does not
    support state-schema evolution, so a checkpoint written by the
    round-4 operator cannot be resumed by this one (start a fresh
    checkpoint; the warm-start replay recipe in the module docstring
    rebuilds state idempotently).

    ``overflow_cap`` (default ``8 * max_members``) bounds the
    ``overflow_ids`` replay-dedup list in exactly the hot-bucket skew
    scenario ``max_members`` exists for: the oldest entries are dropped
    first.  Replays only re-deliver recent (uncommitted) micro-batches,
    whose ids are the NEWEST entries, so the cap is safe unless a
    single bucket absorbs more than ``overflow_cap`` overflowed docs
    within the replay window — a documented recall/exactly-once trade
    at the same boundary as the member cap itself."""
    from sparksearch.pipeline.dedup import band_hashes, minhash_signatures

    if n_hashes % bands:
        raise ValueError(f"n_hashes={n_hashes} not divisible by bands={bands}")
    r = n_hashes // bands
    if overflow_cap is None:
        overflow_cap = 8 * max_members
    key_t = docs.schema[key].dataType
    sigs = minhash_signatures(docs, key, text_col, n_hashes, shingle_k, seed)
    banded = sigs.select(
        "id", "sig",
        F.posexplode(band_hashes(F.col("sig"), bands, r)).alias("band", "bh"))

    out_schema = StructType([
        StructField("a", key_t), StructField("b", key_t),
        StructField("est_jaccard", DoubleType())])
    state_schema = StructType([
        StructField("ids", ArrayType(key_t)),
        StructField("sigs", ArrayType(ArrayType(LongType()))),
        # ids compared while the bucket was at max_members (pairs
        # emitted, signature NOT stored): kept so a replayed
        # micro-batch skips them too — exactly-once holds at the cap
        StructField("overflow_ids", ArrayType(key_t))])

    def update(key_, pdfs, state):
        band_idx = int(key_[0])
        # accumulate every chunk of the batch BEFORE touching state:
        # arrow chunking must not split one batch's group across
        # membership decisions (same rationale as term_stats bloom fix)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            st_ids, st_sigs, st_over = state.get
            ids = list(st_ids)
            sigs_ = [list(s) for s in st_sigs]
            overflow = list(st_over) if st_over is not None else []
        else:
            ids, sigs_, overflow = [], [], []
        seen = set(ids)
        seen.update(overflow)
        out_a, out_b, out_e = [], [], []
        for doc_id, sig in zip(rows["id"], rows["sig"]):
            if doc_id in seen:
                continue  # replayed micro-batch: fully idempotent
            sig = [int(x) for x in sig]
            for mid, msig in zip(ids, sigs_):
                first = next((i for i in range(bands)
                              if sig[i * r:(i + 1) * r]
                              == msig[i * r:(i + 1) * r]), None)
                if first != band_idx:
                    continue  # another (smaller) band emits this pair
                est = sum(x == y for x, y in zip(sig, msig)) / n_hashes
                if est >= threshold:
                    a, b = sorted((doc_id, mid))
                    out_a.append(a)
                    out_b.append(b)
                    out_e.append(est)
            if len(ids) < max_members:
                ids.append(doc_id)
                sigs_.append(sig)
            else:
                overflow.append(doc_id)
            seen.add(doc_id)
        if len(overflow) > overflow_cap:
            overflow = overflow[-overflow_cap:]   # drop oldest first
        state.update((ids, sigs_, overflow))
        if out_a:
            yield pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_e})

    # emissions are append-only facts (each pair exactly once), so the
    # operator is sound under either declared mode; pass "append" when
    # sinking to files (parquet sinks reject Update queries)
    return (banded.groupBy("band", "bh")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    output_mode,
                                    GroupStateTimeout.NoTimeout))
