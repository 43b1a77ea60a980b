"""Streaming-tier tests: exactly-once segmented indexing, checkpoint
resume, session windows with stable turn order, salted stateful term
stats, and the tool-context stream-stream join."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from sparksearch.fixtures import (transcripts_pdf, TRANSCRIPTS_SCHEMA,
                                  transcripts_index_schema, turn_text)
from sparksearch.index import build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.schema import FieldConfig, IndexSchema
from sparksearch.streaming import (StreamingIndexer, open_segmented_index,
                                   compact_segments, conversation_docs,
                                   enrich_with_tool_context,
                                   salted_term_stats)
from sparksearch.streaming.sessions import conversation_docs_batch
from sparksearch.streaming.enrich import enrich_batch_oracle


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path)


def _write_stream_files(spark, tdir, n_convs=30, parts=4, seed=11):
    """Write the transcript corpus as several parquet files so the file
    stream sees multiple batches (maxFilesPerTrigger=1)."""
    # arrival order ≈ event-time order (a real stream), so chunk boundaries
    # never create lateness beyond the generator's late_fraction jitter
    pdf = transcripts_pdf(n_convs, seed=seed).sort_values(
        ["ts", "conv_id", "turn_idx"]).reset_index(drop=True)
    src = f"{tdir}/stream_src"
    os.makedirs(src, exist_ok=True)
    chunk = (len(pdf) + parts - 1) // parts
    for i in range(parts):
        part = pdf.iloc[i * chunk:(i + 1) * chunk]
        if len(part):
            spark.createDataFrame(part, schema=TRANSCRIPTS_SCHEMA) \
                .coalesce(1).write.mode("overwrite") \
                .parquet(f"{src}/f{i:03d}")
    # flatten: spark file stream wants files in one dir
    flat = f"{tdir}/stream_flat"
    os.makedirs(flat, exist_ok=True)
    n = 0
    base_mtime = 1_700_000_000
    for p in sorted(glob.glob(f"{src}/f*/*.parquet")):
        dst = f"{flat}/part{n:03d}.parquet"
        shutil.copy(p, dst)
        # the file source orders batches by mtime; make it strict so batch
        # order follows event-time order deterministically
        os.utime(dst, (base_mtime + n, base_mtime + n))
        n += 1
    return flat, spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def _read_stream(spark, path):
    return (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(path))


def _turn_schema():
    return IndexSchema(key_field="doc_id",
                       text_fields=[FieldConfig(name="text")])


def _postings_set(df):
    rows = df.select("field", "term", "doc_id", "tf",
                     F.col("positions").cast("string").alias("pos"),
                     "len_q").collect()
    return {(r["field"], r["term"], r["doc_id"], r["tf"], r["pos"], r["len_q"])
            for r in rows}


def test_streaming_index_matches_batch(spark, tdir):
    flat, full_df = _write_stream_files(spark, tdir)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()

    segs = glob.glob(f"{idx_path}/segments/epoch=*")
    assert len(segs) >= 2, "expected multiple micro-batch segments"

    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    batch_docs = full_df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")))
    bidx = build_index(batch_docs, _turn_schema())
    assert _postings_set(sidx.postings) == _postings_set(bidx.postings)
    assert sidx.meta == bidx.meta

    # BM25 parity streaming vs batch on the same query
    qd = ast.Term("text", "zephyr")
    got = {(r["doc_id"], round(r["score"], 6))
           for r in compile_query(sidx, qd).collect()}
    want = {(r["doc_id"], round(r["score"], 6))
            for r in compile_query(bidx, qd).collect()}
    assert got == want and got

    # lineage was recorded per epoch with partition counts
    lin = open(f"{idx_path}/_lineage.jsonl").read().strip().splitlines()
    assert len(lin) == len(segs)
    import json
    rec = json.loads(lin[0])
    assert rec["docs"] > 0 and rec["partitions"]
    assert rec["source_offsets"], "per-epoch source offsets missing"


def test_exactly_once_replay_is_idempotent(spark, tdir):
    flat, full_df = _write_stream_files(spark, tdir, n_convs=10, parts=2)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt)
    docs = full_df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")))
    ix.sink_batch(docs, epoch_id=7)
    once = _postings_set(open_segmented_index(spark, idx_path, _turn_schema()).postings)
    ix.sink_batch(docs, epoch_id=7)  # replay of the same epoch
    twice = _postings_set(open_segmented_index(spark, idx_path, _turn_schema()).postings)
    assert once == twice


def test_checkpoint_resume(spark, tdir):
    """Kill mid-stream, restart from checkpoint, verify no loss & no dups."""
    flat, full_df = _write_stream_files(spark, tdir, n_convs=20, parts=4)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"

    # phase 1: only two input files visible
    half = f"{tdir}/half"
    os.makedirs(half, exist_ok=True)
    files = sorted(glob.glob(f"{flat}/*.parquet"))
    for p in files[:2]:
        shutil.copy(p, half)
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q = ix.start(_read_stream(spark, half))
    q.processAllAvailable()
    q.stop()  # "kill"
    n_segs_1 = len(glob.glob(f"{idx_path}/segments/epoch=*"))
    assert n_segs_1 >= 1

    # phase 2: rest of the input arrives; restart with SAME checkpoint
    for p in files[2:]:
        shutil.copy(p, half)
    ix2 = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q2 = ix2.start(_read_stream(spark, half))
    q2.processAllAvailable()
    q2.stop()

    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    batch_docs = full_df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")))
    bidx = build_index(batch_docs, _turn_schema())
    assert _postings_set(sidx.postings) == _postings_set(bidx.postings)
    assert sidx.meta == bidx.meta


def test_compaction_preserves_index(spark, tdir):
    flat, full_df = _write_stream_files(spark, tdir, n_convs=10, parts=3)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()
    before = _postings_set(open_segmented_index(spark, idx_path, _turn_schema()).postings)
    meta_before = open_segmented_index(spark, idx_path, _turn_schema()).meta
    compact_segments(spark, idx_path, _turn_schema())
    assert len(glob.glob(f"{idx_path}/segments/epoch=*")) == 1
    after_idx = open_segmented_index(spark, idx_path, _turn_schema())
    assert _postings_set(after_idx.postings) == before
    assert after_idx.meta == meta_before


def test_session_windows_stable_turn_order(spark, tdir):
    """Out-of-order arrival must not affect conversation text order."""
    pdf = transcripts_pdf(12, seed=23, late_fraction=0.0)
    shuffled = pdf.sample(frac=1.0, random_state=5)  # scramble arrival order
    src = spark.createDataFrame(shuffled, schema=TRANSCRIPTS_SCHEMA)

    # streaming via memory-source-free route: batch oracle vs streaming agg
    # (session_window works in batch mode too — same code path as stream)
    stream_like = conversation_docs(src.withWatermark("ts", "2 minutes"),
                                    gap="5 minutes")
    got = {r["doc_id"]: (r["text"], list(r["turn_idxs"]), r["n_turns"])
           for r in stream_like.collect()}
    want = {r["doc_id"]: (r["text"], list(r["turn_idxs"]), r["n_turns"])
            for r in conversation_docs_batch(src, 300).collect()}
    assert got == want
    # turn order inside each doc is by turn_idx (stable), not arrival
    for _, (text, idxs, n) in got.items():
        assert idxs == sorted(idxs)
    # per-turn text equality under stable turn ordering: reconstruct from
    # (seed, conv_id, turn_idx) — the per-row invariant
    one = next(iter(sorted(got)))
    conv_id = one.split("#")[0]
    doc = got[one]
    regen = " ".join(turn_text(23, conv_id, i) for i in doc[1])
    assert doc[0] == regen


def test_streaming_session_windows_emit_on_watermark(spark, tdir):
    """True streaming run: session docs emitted via foreachBatch sink."""
    flat, full_df = _write_stream_files(spark, tdir, n_convs=8, parts=3, seed=31)
    idx_path, ckpt = f"{tdir}/conv_idx", f"{tdir}/conv_ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, mode="conversation",
                          watermark="1 minute", session_gap="5 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()
    # sessions whose watermark passed are indexed; at least the early convs
    segs = glob.glob(f"{idx_path}/segments/epoch=*")
    emitted = 0
    if segs:
        sidx = open_segmented_index(spark, idx_path, _turn_schema())
        emitted = sidx.postings.select("doc_id").distinct().count()
    want = conversation_docs_batch(
        full_df, 300).select("doc_id").distinct().count()
    # append-mode sessions can hold back the final windows (watermark not
    # yet passed at end of input) — emitted ⊆ expected
    assert emitted <= want
    assert emitted > 0, "no sessions emitted — watermark never advanced"


def test_streaming_near_duplicates_matches_batch(spark, tdir):
    """Streamed≡batch parity for ingest-time LSH dedup, plus replay
    idempotence (re-arriving doc ids emit nothing new)."""
    from sparksearch.pipeline import minhash_near_duplicates
    from sparksearch.streaming import streaming_near_duplicates

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    flat = f"{tdir}/docs_flat"
    os.makedirs(flat, exist_ok=True)
    chunk = (len(pdf) + 3) // 4
    n = 0
    for i in range(4):
        part = pdf.iloc[i * chunk:(i + 1) * chunk]
        spark.createDataFrame(part, "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(f"{tdir}/dsrc/f{i}")
        for p in sorted(glob.glob(f"{tdir}/dsrc/f{i}/*.parquet")):
            dst = f"{flat}/part{n:03d}.parquet"
            shutil.copy(p, dst)
            os.utime(dst, (1_700_000_000 + n,) * 2)
            n += 1
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(flat))
    q = (streaming_near_duplicates(stream, "doc_id", threshold=0.7)
         .writeStream.outputMode("update").format("memory")
         .queryName("sdedup").option("checkpointLocation", f"{tdir}/sd_ckpt")
         .start())
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM sdedup").collect()
    got = {(r["a"], r["b"]): r["est_jaccard"] for r in rows}
    assert len(rows) == len(got), "a pair was emitted more than once"
    want = {(r["a"], r["b"]): r["est_jaccard"]
            for r in minhash_near_duplicates(docs, "doc_id",
                                             threshold=0.7).collect()}
    assert got == want and len(got) > 0
    # replay: the first arrival file re-appears as a new file — every
    # doc id is already in bucket state, so nothing new is emitted
    shutil.copy(f"{flat}/part000.parquet", f"{flat}/part_replay.parquet")
    os.utime(f"{flat}/part_replay.parquet", (1_700_000_000 + n,) * 2)
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) c FROM sdedup").first()["c"] == len(rows)


def test_streaming_near_duplicates_replay_at_cap(spark, tdir):
    """Exactly-once emission must survive replay even when a bucket is
    AT max_members: the overflowed doc's signature is not stored, but
    its id is (overflow_ids), so a replayed micro-batch re-emits
    nothing (ADVICE r4: compared-but-unstored ids broke idempotence)."""
    from sparksearch.streaming import streaming_near_duplicates

    text = "the quick brown fox jumps over the lazy dog again and again"
    flat = f"{tdir}/cap_flat"
    os.makedirs(flat, exist_ok=True)
    for i, doc_id in enumerate([1, 2, 3]):
        spark.createDataFrame([(doc_id, text)], "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(f"{tdir}/cap_src/{i}")
        src = sorted(glob.glob(f"{tdir}/cap_src/{i}/*.parquet"))[0]
        dst = f"{flat}/part{i:03d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_700_000_000 + i,) * 2)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(flat))
    q = (streaming_near_duplicates(stream, "doc_id", threshold=0.7,
                                   max_members=1)
         .writeStream.outputMode("update").format("memory")
         .queryName("capdedup")
         .option("checkpointLocation", f"{tdir}/cap_ckpt").start())
    q.processAllAvailable()
    rows = spark.sql("SELECT a, b FROM capdedup").collect()
    # bucket holds doc 1 only (cap=1); docs 2 and 3 each compare
    # against it → pairs (1,2), (1,3); (2,3) is the documented recall
    # trade at the cap
    assert sorted((r["a"], r["b"]) for r in rows) == [(1, 2), (1, 3)]
    # replay the OVERFLOWED doc (id 2, never stored as a member): its
    # id must still be remembered, so nothing is re-emitted
    shutil.copy(f"{flat}/part001.parquet", f"{flat}/part_replay.parquet")
    os.utime(f"{flat}/part_replay.parquet", (1_700_000_000 + 9,) * 2)
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) c FROM capdedup").first()["c"] == 2


def test_salted_term_stats(spark, tdir):
    flat, full_df = _write_stream_files(spark, tdir, n_convs=10, parts=2, seed=41)
    out = (salted_term_stats(
        _read_stream(spark, flat).withWatermark("ts", "2 minutes"),
        FieldConfig(name="text"), n_salt=4)
        .writeStream.outputMode("update").format("memory")
        .queryName("tstats")
        .option("checkpointLocation", f"{tdir}/ts_ckpt").start())
    out.processAllAvailable()
    out.stop()
    # latest state per salted key, then merge salt buckets
    latest = spark.sql("""
        SELECT term, sum(df) AS df, sum(tf) AS tf FROM (
          SELECT salted, term, df, tf,
                 row_number() OVER (PARTITION BY salted ORDER BY df DESC) rn
          FROM tstats) WHERE rn = 1 GROUP BY term""")
    got = {r["term"]: (r["df"], r["tf"]) for r in latest.collect()}

    from sparksearch.analysis import py_tokenize
    want_df, want_tf = {}, {}
    for _, row in full_df.toPandas().iterrows():
        ts = py_tokenize(row["text"])
        for t in set(ts):
            want_df[t] = want_df.get(t, 0) + 1
        for t in ts:
            want_tf[t] = want_tf.get(t, 0) + 1
    assert got == {t: (want_df[t], want_tf[t]) for t in want_df}


def test_stream_stream_join_tool_context(spark, tdir):
    flat, full_df = _write_stream_files(spark, tdir, n_convs=12, parts=3, seed=53)
    # watermark spans the whole corpus so equality with the batch oracle is
    # deterministic regardless of micro-batch order; late-drop semantics
    # are covered separately by test_watermark_drops_late_events
    enr = enrich_with_tool_context(_read_stream(spark, flat),
                                   watermark="3 hours", bound_seconds=120)
    q = (enr.writeStream.outputMode("append").format("memory")
         .queryName("enriched").option("checkpointLocation", f"{tdir}/j_ckpt")
         .start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT conv_id, turn_idx, tool, tool_turn_idx FROM enriched "
        "WHERE tool IS NOT NULL").collect()
    got_set = {(r["conv_id"], r["turn_idx"], r["tool"], r["tool_turn_idx"])
               for r in got}
    want = enrich_batch_oracle(full_df, 120).filter(F.col("tool").isNotNull())
    want_set = {(r["conv_id"], r["turn_idx"], r["tool"], r["tool_turn_idx"])
                for r in want.collect()}
    # streaming left-outer emits matched rows as they join; matched pairs
    # must agree exactly with the batch oracle
    assert got_set == want_set and want_set


def test_enrich_batch_bucketed_twin(spark):
    """Round-6: the opt-in time-bucketed batch twin
    (enrich_with_tool_context(bucketed=True)) is row-for-row (multiset)
    equal to the straight time-bound left-outer join, including
    sub-second boundary times, duplicate input rows, null conv_ids,
    and unmatched turns."""
    import datetime as dt
    rows = [
        # match exactly AT the 120 s bound, with fractional seconds
        ("c1", 1, "user", None, dt.datetime(2026, 1, 1, 0, 2, 0, 500000)),
        ("c1", 2, "tool", "t1", dt.datetime(2026, 1, 1, 0, 0, 0, 500000)),
        # 0.1 s OUTSIDE the bound but in the candidate bucket
        ("c1", 3, "tool", "t2", dt.datetime(2026, 1, 1, 0, 0, 0, 400000)),
        # duplicate base row: multiplicity must be preserved
        ("c1", 1, "user", None, dt.datetime(2026, 1, 1, 0, 2, 0, 500000)),
        # two tools in-window for one turn: two matched rows
        ("c3", 1, "tool", "t3", dt.datetime(2026, 1, 1, 1, 0, 0)),
        ("c3", 2, "tool", "t4", dt.datetime(2026, 1, 1, 1, 1, 0)),
        ("c3", 3, "user", None, dt.datetime(2026, 1, 1, 1, 1, 30)),
        # unmatched turn and null conv_id
        ("c2", 1, "user", None, dt.datetime(2026, 1, 1, 0, 5, 0)),
        (None, 9, "user", None, dt.datetime(2026, 1, 1, 0, 5, 0)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, "
              "ts timestamp")
    got = enrich_with_tool_context(df, bucketed=True)
    want = enrich_batch_oracle(df)
    assert got.columns == want.columns

    def _key(r):
        return tuple(str(x) for x in r)
    assert sorted(map(_key, got.collect())) == \
        sorted(map(_key, want.collect()))
    # the c1 turn matches t1 (boundary-inclusive) but not t2, twice
    matched = [r for r in got.collect()
               if r["conv_id"] == "c1" and r["role"] == "user"]
    assert [r["tool"] for r in matched] == ["t1", "t1"]


def test_watermark_drops_late_events(spark, tdir):
    """A row arriving with event time far behind the watermark is dropped
    (late-data semantics) — the streaming index intentionally misses it."""
    import pandas as pd, datetime as dt
    rows1 = [{"conv_id": "c1", "turn_idx": i, "role": "user",
              "text": f"turn {i} alpha", "tool": None,
              "ts": dt.datetime(2026, 1, 1, 10, 0, i)} for i in range(3)]
    # a much newer event advances the watermark
    rows1.append({"conv_id": "c2", "turn_idx": 0, "role": "user",
                  "text": "future beacon", "tool": None,
                  "ts": dt.datetime(2026, 1, 1, 11, 0, 0)})
    late = [{"conv_id": "c1", "turn_idx": 3, "role": "user",
             "text": "very late straggler", "tool": None,
             "ts": dt.datetime(2026, 1, 1, 10, 0, 30)}]
    src = f"{tdir}/late_src"
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(pd.DataFrame(rows1), schema=TRANSCRIPTS_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(f"{tdir}/w1")
    shutil.copy(glob.glob(f"{tdir}/w1/*.parquet")[0], f"{src}/a.parquet")
    idx_path, ckpt = f"{tdir}/lidx", f"{tdir}/lckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="1 minute")
    q = ix.start(_read_stream(spark, src))
    q.processAllAvailable()
    spark.createDataFrame(pd.DataFrame(late), schema=TRANSCRIPTS_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(f"{tdir}/w2")
    shutil.copy(glob.glob(f"{tdir}/w2/*.parquet")[0], f"{src}/b.parquet")
    q.processAllAvailable()
    q.stop()
    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    docs = {r["doc_id"] for r in sidx.postings.select("doc_id").distinct().collect()}
    assert "c1#3" not in docs, "late straggler should be dropped by watermark"
    assert {"c1#0", "c1#1", "c1#2", "c2#0"} <= docs


def test_delete_docs_and_vacuum(spark, tdir):
    """ambulkdelete/vacuum analog: logical tombstones filtered at read,
    applied physically (with stats rewrite) at compaction."""
    from sparksearch.streaming.indexer import delete_docs
    flat, full_df = _write_stream_files(spark, tdir, n_convs=8, parts=2, seed=61)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()

    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    all_docs = [r["doc_id"] for r in
                sidx.postings.select("doc_id").distinct().collect()]
    victims = sorted(all_docs)[:3]
    n_before = len(all_docs)

    delete_docs(spark, idx_path, victims)
    sidx2 = open_segmented_index(spark, idx_path, _turn_schema())
    remaining = {r["doc_id"] for r in
                 sidx2.postings.select("doc_id").distinct().collect()}
    assert not (set(victims) & remaining)
    assert len(remaining) == n_before - 3
    assert sidx2.meta["text"]["num_docs"] == n_before - 3

    compact_segments(spark, idx_path, _turn_schema())
    import os as _os
    assert not _os.path.isdir(f"{idx_path}/_deletes")
    sidx3 = open_segmented_index(spark, idx_path, _turn_schema())
    remaining3 = {r["doc_id"] for r in
                  sidx3.postings.select("doc_id").distinct().collect()}
    assert remaining3 == remaining
    # vacuum recomputed exact stats: avg_len over surviving docs only
    from pyspark.sql import functions as F
    total_tf = sidx3.postings.agg(F.sum("tf")).collect()[0][0]
    assert sidx3.meta["text"]["avg_len"] == total_tf / len(remaining)


def test_layered_compaction(spark, tdir):
    """Tiered merge (reference LayeredMergePolicy): small segments merge
    into a layer segment; search results identical pre/post; a second
    pass with nothing to gain merges nothing."""
    from sparksearch.streaming.indexer import compact_layered, _committed_segments
    flat, full_df = _write_stream_files(spark, tdir, n_convs=12, parts=4)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()
    before_segs = _committed_segments(idx_path)
    assert len(before_segs) >= 2
    before = _postings_set(open_segmented_index(spark, idx_path, _turn_schema()).postings)
    meta_before = open_segmented_index(spark, idx_path, _turn_schema()).meta
    # choose a layer each segment fits in (size <= layer) and that the
    # group's total fills (total >= layer + layer/3)
    from sparksearch.streaming.indexer import _segment_bytes
    sizes = [_segment_bytes(s) for s in before_segs]
    layer = int(sum(sizes) * 0.7)
    assert max(sizes) <= layer
    new = compact_layered(spark, idx_path, _turn_schema(),
                          layer_sizes=[layer])
    assert new, "expected at least one merge candidate"
    after_idx = open_segmented_index(spark, idx_path, _turn_schema())
    assert _postings_set(after_idx.postings) == before
    assert after_idx.meta == meta_before
    # steady state: the merged segment now exceeds the layer → no-op
    assert compact_layered(spark, idx_path, _turn_schema(),
                           layer_sizes=[layer]) == []


def test_manifest_hides_retired_segments(spark, tdir):
    """Crash-safety: a retired segment dir that survives (crash between
    manifest swap and delete) must stay invisible to readers."""
    import json as _json
    import os as _os
    from sparksearch.streaming.indexer import (_committed_segments,
                                               _read_manifest)
    flat, _ = _write_stream_files(spark, tdir, n_convs=8, parts=3)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt, watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()
    before = _postings_set(open_segmented_index(spark, idx_path, _turn_schema()).postings)
    compact_segments(spark, idx_path, _turn_schema())
    man = _read_manifest(idx_path)
    assert man and man["retired"]
    # simulate the crash: resurrect a retired dir with a commit marker
    zombie = f"{idx_path}/segments/{sorted(man['retired'])[0]}"
    _os.makedirs(zombie, exist_ok=True)
    with open(f"{zombie}/_SEGMENT_COMMITTED", "w") as fh:
        fh.write("zombie")
    live = _committed_segments(idx_path)
    assert zombie not in live and len(live) == 1
    # readers still see exactly the compacted data
    assert _postings_set(open_segmented_index(
        spark, idx_path, _turn_schema()).postings) == before


def test_salted_term_stats_bloom_dedup(spark, tdir):
    """A doc that re-arrives in a later micro-batch (replay) must not
    double-count df OR tf in bloom mode — both counters admit each doc
    exactly once, keeping the running (df, tf) pair internally
    consistent (batch mode documents one-batch-per-doc as a
    precondition instead)."""
    import datetime as _dt
    src = f"{tdir}/bloom_src"
    os.makedirs(src, exist_ok=True)
    # same (conv_id, turn_idx) doc contributes 'alpha' in two batch files
    rows = [("c1", 0, "user", "alpha beta", None,
             _dt.datetime(2026, 1, 1, 0, 0, 0)),
            ("c1", 0, "user", "alpha gamma", None,
             _dt.datetime(2026, 1, 1, 0, 0, 30))]
    for i, row in enumerate(rows):
        spark.createDataFrame([row], schema=TRANSCRIPTS_SCHEMA) \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    n = 0
    for p in sorted(glob.glob(f"{src}/f*/*.parquet")):
        dst = f"{src}/part{n:03d}.parquet"
        shutil.copy(p, dst)
        os.utime(dst, (1_700_000_000 + n, 1_700_000_000 + n))
        shutil.rmtree(os.path.dirname(p))
        n += 1
    stream = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .withWatermark("ts", "10 minutes"))
    out = (salted_term_stats(stream, FieldConfig(name="text"), n_salt=2,
                             dedup_docs="bloom")
           .writeStream.outputMode("update").format("memory")
           .queryName("bloomstats")
           .option("checkpointLocation", f"{tdir}/bloom_ckpt").start())
    out.processAllAvailable()
    out.stop()
    latest = spark.sql("""
        SELECT term, sum(df) AS df, sum(tf) AS tf FROM (
          SELECT salted, term, df, tf,
                 row_number() OVER (PARTITION BY salted ORDER BY tf DESC) rn
          FROM bloomstats) WHERE rn = 1 GROUP BY term""")
    got = {r["term"]: (r["df"], r["tf"]) for r in latest.collect()}
    # df('alpha') == tf('alpha') == 1: the doc's second arrival is a
    # replay — the bloom admits its df AND tf contribution exactly once
    assert got["alpha"] == (1, 1), got
    assert got["beta"] == (1, 1) and got["gamma"] == (1, 1)


def test_parquet_merge_sink_exercises_iceberg_merge_semantics(spark, tdir):
    """The MERGE keying the Iceberg sink relies on, executed for real via
    the jar-free twin (shared MERGE_KEY / keyed_batch / merge_condition):
    replayed epochs are no-ops, recomputed replays UPDATE in place, new
    epochs INSERT."""
    from sparksearch.streaming.iceberg_sink import (
        ParquetMergeSink, merge_condition, MERGE_KEY)
    sink = ParquetMergeSink(spark, f"{tdir}/merge_sink")
    schema = ("field string, term string, doc_id string, tf int, "
              "positions array<int>, len_q int")
    b0 = spark.createDataFrame(
        [("text", "alpha", "c1#0", 2, [0, 3], 4),
         ("text", "beta", "c1#0", 1, [1], 4)], schema)
    sink.merge_batch(b0, 0)
    first = {tuple(r) for r in sink.read()
             .select("field", "term", "doc_id", "tf", "epoch").collect()}
    assert first == {("text", "alpha", "c1#0", 2, 0),
                     ("text", "beta", "c1#0", 1, 0)}

    # exact replay of epoch 0 → MATCHED → UPDATE to identical values → no-op
    sink.merge_batch(b0, 0)
    assert {tuple(r) for r in sink.read()
            .select("field", "term", "doc_id", "tf", "epoch")
            .collect()} == first

    # recomputed replay (same key, different tf) → UPDATE SET * in place
    b0b = spark.createDataFrame([("text", "alpha", "c1#0", 5, [0], 4)], schema)
    sink.merge_batch(b0b, 0)
    rows = {(r["term"], r["tf"]) for r in sink.read().collect()}
    assert ("alpha", 5) in rows and ("alpha", 2) not in rows
    assert ("beta", 1) in rows and sink.read().count() == 2

    # new epoch → NOT MATCHED → INSERT
    b1 = spark.createDataFrame([("text", "alpha", "c2#0", 1, [7], 9)], schema)
    sink.merge_batch(b1, 1)
    assert sink.read().count() == 3
    assert {r["epoch"] for r in sink.read().collect()} == {0, 1}

    # the twin keys on exactly the condition the Iceberg MERGE SQL emits
    assert merge_condition("t", "s").split(" AND ") == [
        f"t.{k} = s.{k}" for k in MERGE_KEY]


def test_parquet_merge_sink_in_foreachbatch_stream(spark, tdir):
    """ParquetMergeSink driven by a real foreachBatch micro-batch stream."""
    import glob as _glob
    from sparksearch.streaming.iceberg_sink import ParquetMergeSink
    from sparksearch.index import postings_df
    from sparksearch.schema import IndexSchema, FieldConfig
    import datetime as _dt
    src = f"{tdir}/merge_stream_src"
    os.makedirs(src, exist_ok=True)
    rows = [("c1", 0, "user", "alpha beta", None,
             _dt.datetime(2026, 1, 1)),
            ("c2", 0, "user", "beta gamma", None,
             _dt.datetime(2026, 1, 1, 0, 1))]
    for i, row in enumerate(rows):
        spark.createDataFrame([row], schema=TRANSCRIPTS_SCHEMA) \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    n = 0
    for p in sorted(_glob.glob(f"{src}/f*/*.parquet")):
        dst = f"{src}/part{n:03d}.parquet"
        shutil.copy(p, dst)
        shutil.rmtree(os.path.dirname(p))
        n += 1
    sink = ParquetMergeSink(spark, f"{tdir}/merge_stream_sink")
    ischema = IndexSchema(key_field="doc_id",
                          text_fields=[FieldConfig(name="text")])

    def body(batch, epoch_id):
        docs = batch.withColumn(
            "doc_id", F.concat_ws("#", "conv_id",
                                  F.col("turn_idx").cast("string")))
        sink.merge_batch(postings_df(docs, ischema), epoch_id)

    q = (spark.readStream.schema(TRANSCRIPTS_SCHEMA)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(body)
         .option("checkpointLocation", f"{tdir}/merge_stream_ckpt").start())
    q.processAllAvailable()
    q.stop()
    got = {(r["term"], r["doc_id"]) for r in sink.read().collect()}
    assert got == {("alpha", "c1#0"), ("beta", "c1#0"),
                   ("beta", "c2#0"), ("gamma", "c2#0")}


def test_soak_concurrent_ingest_compaction_readers(spark, tdir):
    """Soak (reference stressgres analog): continuous ingest + layered
    compaction + concurrent readers interleaved under the manifest swap.

    Invariants asserted on EVERY read while ingest+compaction run:
    (a) no posting key (field, term, doc_id) appears twice — a reader
        never sees a source segment and its merged replacement together;
    (b) the visible doc count never decreases (no reader sees a partial
        index mid-swap);
    (c) a BM25 search always executes.
    Afterwards: vacuum_retired() reclaims retired dirs and the surviving
    postings equal the batch build exactly."""
    from sparksearch.streaming.indexer import (compact_layered,
                                               vacuum_retired,
                                               _segment_bytes,
                                               _committed_segments)
    flat, full_df = _write_stream_files(spark, tdir, n_convs=24, parts=8)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt,
                          watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))

    import time as _time
    last_docs, reads, compactions = 0, 0, 0
    deadline = _time.time() + 180
    while _time.time() < deadline:
        lin = f"{idx_path}/_lineage.jsonl"
        done = (os.path.exists(lin)
                and len(open(lin).read().strip().splitlines()) >= 8)
        try:
            idx = open_segmented_index(spark, idx_path, _turn_schema())
        except FileNotFoundError:
            continue
        p = idx.postings
        dups = (p.groupBy("field", "term", "doc_id").count()
                .filter(F.col("count") > 1).count())
        assert dups == 0, "reader saw a segment and its merged replacement"
        n_docs = p.select("doc_id").distinct().count()
        assert n_docs >= last_docs, "visible doc count went backwards"
        last_docs = n_docs
        hits = compile_query(idx, ast.Term("text", "zephyr")).count()
        assert hits >= 0
        reads += 1
        # layered compaction every other read, with a layer sized so
        # accumulated small segments actually merge
        if reads % 2 == 0:
            segs = _committed_segments(idx_path)
            if len(segs) >= 3:
                layer = int(sum(_segment_bytes(s) for s in segs) * 0.7)
                if compact_layered(spark, idx_path, _turn_schema(),
                                   layer_sizes=[layer]):
                    compactions += 1
        if done:
            break
    q.processAllAvailable()
    q.stop()
    assert reads >= 5, f"soak made too few reads ({reads})"
    assert compactions >= 1, "soak never exercised a concurrent compaction"

    # retired dirs survive until vacuum (in-flight reader safety) …
    removed = vacuum_retired(idx_path)
    assert removed >= 1
    # … and the final visible index equals the batch build exactly
    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    batch_docs = full_df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id",
                              F.col("turn_idx").cast("string")))
    bidx = build_index(batch_docs, _turn_schema())
    assert _postings_set(sidx.postings) == _postings_set(bidx.postings)
    assert sidx.meta == bidx.meta


def test_force_merge_admin(spark, tdir):
    """paradedb.force_merge analog: oneshot merges every committed
    segment into one base segment; postings survive byte-identical and
    version_info reports the backend."""
    from sparksearch.api import force_merge, version_info
    from sparksearch.streaming.indexer import _committed_segments
    flat, _ = _write_stream_files(spark, tdir, n_convs=10, parts=4)
    idx_path, ckpt = f"{tdir}/idx", f"{tdir}/ckpt"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt,
                          watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()
    assert len(_committed_segments(idx_path)) >= 2
    before = _postings_set(
        open_segmented_index(spark, idx_path, _turn_schema()).postings)
    out = force_merge(spark, idx_path, _turn_schema(), oneshot=True)
    assert out["segments_after"] == 1
    assert out["segments_before"] >= 2
    after = _postings_set(
        open_segmented_index(spark, idx_path, _turn_schema()).postings)
    assert after == before
    vi = version_info()
    assert vi["backend"] == "pyspark" and vi["pyspark"]


_CRASH_CHILD = '''
import os, signal, sys
sys.path.insert(0, "/root/repo")
crash_at, idx_path = sys.argv[1], sys.argv[2]

import sparksearch.streaming.indexer as ind

if crash_at == "after_phase1":
    # die right after the phase-1 manifest write + commit marker, BEFORE
    # the rename — the new dir never reaches its final path
    _orig = ind._atomic_success
    def _boom(path):
        _orig(path)
        os.kill(os.getpid(), signal.SIGKILL)
    ind._atomic_success = _boom
elif crash_at == "after_rename":
    # die right after the rename, BEFORE the phase-2 (commit-point)
    # manifest flip — new dir at final path but manifest-retired
    _orig_rename = os.rename
    def _boom_rename(src, dst):
        _orig_rename(src, dst)
        if "epoch=c" in os.path.basename(dst):
            os.kill(os.getpid(), signal.SIGKILL)
    os.rename = _boom_rename

from sparksearch.session import get_spark
from sparksearch.schema import IndexSchema, FieldConfig
spark = get_spark(app_name="crash-child", cores=4, shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
schema = IndexSchema(key_field="doc_id", text_fields=[FieldConfig(name="text")])
segs = ind._committed_segments(idx_path)
layer = int(sum(ind._segment_bytes(s) for s in segs) * 0.7)
ind.compact_layered(spark, idx_path, schema, layer_sizes=[layer])
print("NO_CRASH")  # reaching here means the kill hook never fired
'''


@pytest.mark.parametrize("crash_at", ["after_phase1", "after_rename"])
def test_soak_kill_mid_manifest_swap_then_restart(spark, tdir, crash_at):
    """Round-4 verdict ask #8: SIGKILL the compactor INSIDE the manifest
    swap (both crash windows of the two-phase commit), then assert

    (a) a reader opening the crashed index sees EXACTLY the pre-merge
        postings — never partial state, never old+new together;
    (b) a restarted compaction converges, after which postings equal the
        batch build exactly (the crash left nothing poisoned behind).
    """
    import subprocess
    import sys as _sys
    from sparksearch.streaming.indexer import (compact_layered,
                                               vacuum_retired,
                                               _segment_bytes,
                                               _committed_segments)
    flat, full_df = _write_stream_files(spark, tdir, n_convs=12, parts=6)
    idx_path, ckpt = f"{tdir}/idx_{crash_at}", f"{tdir}/ckpt_{crash_at}"
    ix = StreamingIndexer(_turn_schema(), idx_path, ckpt,
                          watermark="10 minutes")
    q = ix.start(_read_stream(spark, flat))
    q.processAllAvailable()
    q.stop()
    assert len(_committed_segments(idx_path)) >= 3
    before = _postings_set(
        open_segmented_index(spark, idx_path, _turn_schema()).postings)

    child = subprocess.run(
        [_sys.executable, "-c", _CRASH_CHILD, crash_at, idx_path],
        capture_output=True, text=True, timeout=300)
    # SIGKILL mid-swap: the child must NOT have finished cleanly
    assert child.returncode != 0, child.stdout
    assert "NO_CRASH" not in child.stdout

    # (a) reader invariants across the crash: exactly the pre-merge set
    ridx = open_segmented_index(spark, idx_path, _turn_schema())
    crashed = _postings_set(ridx.postings)
    assert crashed == before, "reader saw partial state across the crash"
    dups = (ridx.postings.groupBy("field", "term", "doc_id").count()
            .filter(F.col("count") > 1).count())
    assert dups == 0

    # (b) restart: compaction retries to completion and the index
    # converges on the batch-build postings
    segs = _committed_segments(idx_path)
    layer = int(sum(_segment_bytes(s) for s in segs) * 0.7)
    assert compact_layered(spark, idx_path, _turn_schema(),
                           layer_sizes=[layer])
    vacuum_retired(idx_path)
    sidx = open_segmented_index(spark, idx_path, _turn_schema())
    batch_docs = full_df.withColumn(
        "doc_id", F.concat_ws("#", "conv_id",
                              F.col("turn_idx").cast("string")))
    bidx = build_index(batch_docs, _turn_schema())
    assert _postings_set(sidx.postings) == _postings_set(bidx.postings)
    assert sidx.meta == bidx.meta
