"""Continuous indexing: micro-batch → immutable segment, exactly-once.

Write path (north_star): readStream(transcripts) → watermark on ``ts`` →
dropDuplicates on the natural key within the watermark → foreachBatch
sink.  Each micro-batch builds its postings doc-locally (zero shuffle,
sparksearch.index.postings_df) and lands as

    {index}/segments/epoch=<batchId>/postings/   (term-bucketed parquet)
    {index}/segments/epoch=<batchId>/stats.json  (n_docs, total_len, df by term? no —
                                                  df merges from postings at open)
    {index}/_lineage.jsonl                       (per-batch lineage + metrics)

**Exactly-once**: Structured Streaming may replay a batch after failure;
the segment path is keyed by the deterministic ``batchId``, written with
overwrite + atomic _SUCCESS marker, so a replayed batch overwrites its own
segment — an idempotent MERGE keyed on epoch (the parquet-native analog of
``MERGE INTO ... ON (term, doc, epoch)`` in the Iceberg sink; Iceberg jars
are not in this environment, so the sink is pluggable and the Iceberg
variant raises ImportError until they are).

**Resume**: the streaming checkpoint (offsets/commits) lives at
``checkpoint``; on restart Spark replays only uncommitted batches, and the
epoch-keyed segments make that replay a no-op for data already written.
Per-partition lineage (which input files fed which epoch) is recorded per
batch in _lineage.jsonl.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparksearch.index import (SearchIndex, postings_df, N_TERM_BUCKETS)
from sparksearch.schema import IndexSchema


def _atomic_success(path: str) -> None:
    with open(os.path.join(path, "_SEGMENT_COMMITTED"), "w") as fh:
        fh.write(str(time.time()))


class StreamingIndexer:
    """Continuous BM25 indexer over a transcript stream.

    ``mode="turn"``: one document per turn, key ``conv_id#turn_idx``
    (per-row invariant unit).
    ``mode="conversation"``: session-window assembled conversation docs
    (see streaming.sessions), key ``conv_id#<window start epoch>``.
    """

    def __init__(self, schema: IndexSchema, index_path: str, checkpoint: str,
                 watermark: str = "2 minutes", session_gap: str = "5 minutes",
                 mode: str = "turn", strategy: str = "local",
                 n_buckets: int = 16):
        # n_buckets is fixed per index (not per segment) so bucket pruning
        # works across the whole LSM; micro-batch segments default to 16
        # buckets (commit cost is O(tasks x buckets) per batch)
        self.n_buckets = n_buckets
        self.schema = schema
        self.index_path = index_path
        self.checkpoint = checkpoint
        self.watermark = watermark
        self.session_gap = session_gap
        self.mode = mode
        self.strategy = strategy
        os.makedirs(index_path, exist_ok=True)

    # -- document assembly -------------------------------------------------
    def _docs_stream(self, stream: DataFrame) -> DataFrame:
        wm = stream.withWatermark("ts", self.watermark)
        if self.mode == "turn":
            # late/duplicate turns: keep first arrival per natural key
            deduped = wm.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
            return deduped.withColumn(
                "doc_id", F.concat_ws("#", "conv_id",
                                      F.col("turn_idx").cast("string")))
        from sparksearch.streaming.sessions import conversation_docs
        return conversation_docs(wm, gap=self.session_gap)

    # -- sink ---------------------------------------------------------------
    def _segment_path(self, epoch_id: int) -> str:
        return f"{self.index_path}/segments/epoch={epoch_id}"

    def sink_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body — idempotent per epoch."""
        seg = self._segment_path(epoch_id)
        spark = batch_df.sparkSession

        batch_df = batch_df.persist()
        try:
            n_docs = batch_df.count()
            if n_docs == 0:
                return
            (postings_df(batch_df, self.schema, self.strategy)
             .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)))
             .repartition("field", "tb")
             .write.mode("overwrite").partitionBy("field", "tb")
             .parquet(f"{seg}/postings"))
            postings = spark.read.parquet(f"{seg}/postings")
            stats = (postings.groupBy("field")
                     .agg(F.sum("tf").alias("total_len")).collect())
            with open(f"{seg}/stats.json", "w") as fh:
                json.dump({"n_docs": n_docs, "epoch": epoch_id,
                           "n_buckets": self.n_buckets,
                           "fields": {r["field"]: {"total_len": r["total_len"]}
                                      for r in stats}}, fh)
            _atomic_success(seg)
            self._lineage(epoch_id, n_docs, batch_df)
        finally:
            batch_df.unpersist()

    def _lineage(self, epoch_id: int, n_docs: int, batch_df: DataFrame) -> None:
        """Per-batch lineage + metrics (north rule: resumable with
        per-partition lineage).  Records the input files feeding the epoch
        and per-partition row counts."""
        # source offsets for this epoch from the streaming checkpoint — the
        # authoritative record of which input slice fed the segment
        # (input_file_name() is blank after stateful operators)
        offsets = None
        try:
            with open(f"{self.checkpoint}/offsets/{epoch_id}") as fh:
                offsets = [line.strip() for line in fh if line.strip()][-1]
        except OSError:
            pass
        part_counts = [
            {"partition": r["p"], "rows": r["n"]} for r in
            batch_df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("n")).collect()]
        rec = {"epoch": epoch_id, "ts": time.time(), "docs": n_docs,
               "segment": self._segment_path(epoch_id),
               "source_offsets": offsets, "partitions": part_counts}
        with open(f"{self.index_path}/_lineage.jsonl", "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    # -- query --------------------------------------------------------------
    def start(self, stream: DataFrame, trigger: dict | None = None):
        docs = self._docs_stream(stream)
        writer = (docs.writeStream
                  .foreachBatch(lambda df, eid: self.sink_batch(df, eid))
                  .outputMode("append")
                  .option("checkpointLocation", self.checkpoint))
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()


def _committed_segments(index_path: str) -> list:
    base = f"{index_path}/segments"
    if not os.path.isdir(base):
        return []
    segs = []
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        if os.path.exists(os.path.join(p, "_SEGMENT_COMMITTED")):
            segs.append(p)
    return segs


def delete_docs(spark: SparkSession, index_path: str, doc_ids: list) -> int:
    """Logical delete (reference ambulkdelete, postgres/delete.rs):
    tombstones are appended under ``_deletes/`` and filtered out of every
    read; compaction applies them physically (vacuum analog)."""
    df = spark.createDataFrame([(d,) for d in doc_ids], "doc_id string")
    df.coalesce(1).write.mode("append").parquet(f"{index_path}/_deletes")
    return len(doc_ids)


def _deletes_df(spark: SparkSession, index_path: str) -> DataFrame | None:
    p = f"{index_path}/_deletes"
    if os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p)):
        return spark.read.parquet(p).select("doc_id").distinct()
    return None


def open_segmented_index(spark: SparkSession, index_path: str,
                         schema: IndexSchema,
                         docs: DataFrame | None = None) -> SearchIndex:
    """Open the union of committed segments as one queryable index.

    Per-segment stats merge at read time exactly like Tantivy merges
    per-segment doc-freq/fieldnorm stats across an LSM of segments
    (docs/welcome/architecture.mdx:19-48); df(term) sums over segments
    because a doc lives in exactly one segment.
    """
    from functools import reduce
    segs = _committed_segments(index_path)
    if not segs:
        raise FileNotFoundError(f"no committed segments under {index_path}")
    postings = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(f"{s}/postings") for s in segs])
    deletes = _deletes_df(spark, index_path)
    n_deleted = 0
    if deletes is not None:
        postings = postings.join(deletes, "doc_id", "left_anti")
        n_deleted = deletes.count()
    from sparksearch.index import corpus_stats_df
    corpus_stats = corpus_stats_df(postings)
    n_docs, totals, buckets = 0, {}, set()
    for s in segs:
        with open(f"{s}/stats.json") as fh:
            st = json.load(fh)
        n_docs += st["n_docs"]
        buckets.add(st.get("n_buckets"))
        for f_, v in st["fields"].items():
            totals[f_] = totals.get(f_, 0) + v["total_len"]
    # like the reference, corpus stats stay approximate after logical
    # deletes until compaction rewrites them; doc count is adjusted
    n_docs = max(n_docs - n_deleted, 1)
    meta = {f_: {"num_docs": n_docs, "avg_len": t / max(n_docs, 1)}
            for f_, t in totals.items()}
    if docs is None:
        docs = (postings.select("doc_id").distinct())
    # bucket pruning only when every segment shares one modulus
    nb = buckets.pop() if len(buckets) == 1 else None
    return SearchIndex(spark, schema, docs, postings, corpus_stats, meta,
                       n_buckets=nb)


def compact_segments(spark: SparkSession, index_path: str,
                     schema: IndexSchema) -> str:
    """Merge all committed segments into one base segment (reference merge
    policy analog: merge_policy.rs layered merges; here a single-layer
    full compaction — Iceberg's rewrite_data_files equivalent)."""
    import shutil
    segs = _committed_segments(index_path)
    if len(segs) <= 1:
        return segs[0] if segs else ""
    from functools import reduce
    merged = f"{index_path}/segments/epoch=-1__compacting"
    final = f"{index_path}/segments/epoch=-1"
    postings = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(f"{s}/postings") for s in segs])
    deletes = _deletes_df(spark, index_path)
    if deletes is not None:
        postings = postings.join(deletes, "doc_id", "left_anti")
    (postings.repartition("field", "tb")
     .write.mode("overwrite").partitionBy("field", "tb")
     .parquet(f"{merged}/postings"))
    written = spark.read.parquet(f"{merged}/postings")
    seg_buckets = set()
    for s in segs:
        with open(f"{s}/stats.json") as fh:
            seg_buckets.add(json.load(fh).get("n_buckets"))
    nb = seg_buckets.pop() if len(seg_buckets) == 1 else None
    if deletes is not None:
        # vacuum: recompute exact stats from the surviving postings
        n_docs = written.select("doc_id").distinct().count()
        rows = written.groupBy("field").agg(F.sum("tf").alias("t")).collect()
        totals = {r["field"]: r["t"] for r in rows}
    else:
        n_docs, totals = 0, {}
        for s in segs:
            with open(f"{s}/stats.json") as fh:
                st = json.load(fh)
            n_docs += st["n_docs"]
            for f_, v in st["fields"].items():
                totals[f_] = totals.get(f_, 0) + v["total_len"]
    with open(f"{merged}/stats.json", "w") as fh:
        json.dump({"n_docs": n_docs, "epoch": -1, "n_buckets": nb,
                   "fields": {f_: {"total_len": t} for f_, t in totals.items()}},
                  fh)
    # commit order: new segment becomes visible only after olds are gone
    for s in segs:
        shutil.rmtree(s)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(merged, final)
    _atomic_success(final)
    if deletes is not None:
        shutil.rmtree(f"{index_path}/_deletes", ignore_errors=True)
    return final
