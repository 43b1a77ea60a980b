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


def _written_partition_counts(postings_dir: str) -> list:
    """Row counts per written (field, tb) partition dir, summed from
    parquet footers — a driver metadata pass over O(files-per-segment)
    footers (bounded: salt fan-out × buckets), no data scan."""
    import pyarrow.parquet as pq
    counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(postings_dir):
        rel = os.path.relpath(root, postings_dir)
        for f in files:
            if f.endswith(".parquet"):
                n = pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                counts[rel] = counts.get(rel, 0) + n
    return [{"partition": k, "rows": v} for k, v in sorted(counts.items())]


def _atomic_success(path: str) -> None:
    with open(os.path.join(path, "_SEGMENT_COMMITTED"), "w") as fh:
        fh.write(str(time.time()))


def segment_content_hash(postings: DataFrame) -> int:
    """Order-independent 64-bit content hash of a postings set (XOR of
    per-row hashes — rows are unique per (field, term, doc_id), so XOR
    is collision-safe against reordering and duplication).  Stored in
    stats.json; ``validate_checksum`` recomputes and compares (the
    reference's paradedb.validate_checksum analog over block CRCs)."""
    row = (postings.agg(F.bit_xor(
        F.xxhash64("field", "term", "doc_id", "tf")).alias("h")).collect())
    return int(row[0]["h"] or 0)


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
                 n_buckets: int = 16, prune_dedup_columns: bool = True):
        # n_buckets is fixed per index (not per segment) so bucket pruning
        # works across the whole LSM; micro-batch segments default to 16
        # buckets (commit cost is O(tasks x buckets) per batch)
        self.n_buckets = n_buckets
        # prune_dedup_columns: drop columns the sink never reads BEFORE
        # the stateful dedup exchange (turn mode) — disable only when a
        # subclassed sink consumes extra stream columns
        self.prune_dedup_columns = prune_dedup_columns
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
        if self.mode == "turn":
            # PRUNE dead columns before the stateful exchange: the
            # dedup shuffle is the drain's one payload exchange (exact
            # dedup requires duplicate keys to meet, so the indexed
            # payload crosses the wire exactly once — that is the
            # floor), and every column the sink never reads is pure
            # shuffle-bandwidth overhead on it.  Kept: the natural key,
            # the event time, and any column an indexed field (text or
            # attribute) references by name in its name/source.
            pruned = stream
            if self.prune_dedup_columns:
                refs = {c.source or c.name
                        for c in self.schema.text_fields}
                refs |= set(self.schema.field_names)
                refs |= self.schema.indexed_attr_fields()
                # case-INSENSITIVE substring match (r5 ADVICE): Spark
                # resolves columns case-insensitively, so a schema
                # source like lower(Body) must keep stream column
                # `body` — a case mismatch silently dropping the text
                # column would index nothing
                low_refs = [r.lower() for r in refs]
                needed = [c for c in stream.columns
                          if c in ("conv_id", "turn_idx", "ts")
                          or any(c.lower() in r for r in low_refs)]
                pruned = stream.select(*needed)
            wm = pruned.withWatermark("ts", self.watermark)
            # late/duplicate turns: keep first arrival per natural key
            deduped = wm.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
            return deduped.withColumn(
                "doc_id", F.concat_ws("#", "conv_id",
                                      F.col("turn_idx").cast("string")))
        wm = stream.withWatermark("ts", self.watermark)
        from sparksearch.streaming.sessions import conversation_docs
        return conversation_docs(wm, gap=self.session_gap)

    # -- sink ---------------------------------------------------------------
    def _segment_path(self, epoch_id: int) -> str:
        return f"{self.index_path}/segments/epoch={epoch_id}"

    def sink_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """foreachBatch body — idempotent per epoch, ONE Spark job.

        The doc count rides the write as an ``observe()`` on the input
        frame (filters are never pushed through CollectMetrics, so every
        branch of the postings fan-out sees the full batch and the metric
        is the batch size), and the segment stats + content hash ride as
        an observation on the postings frame — mirroring the batch path
        (``index.build_and_save``).  The previous shape spent two extra
        jobs per epoch (a persist+count pre-pass and a read-back stats
        scan), a per-batch constant that capped sustained micro-batch
        throughput.  The hash definition is unchanged, so
        ``validate_checksum``'s re-read comparison still holds."""
        seg = self._segment_path(epoch_id)
        from pyspark.sql import Observation
        from sparksearch.index import bucketed_repartition
        fields = self.schema.field_names
        in_obs = None
        if self.schema.text_fields:
            in_obs = Observation()
            batch_df = batch_df.observe(
                in_obs, F.count(F.lit(1)).alias("n_docs"))
        obs = Observation()
        p = (postings_df(batch_df, self.schema, self.strategy)
             .withColumn("tb", F.pmod(F.xxhash64("term"),
                                      F.lit(self.n_buckets)))
             .observe(obs,
                      F.bit_xor(F.xxhash64("field", "term", "doc_id",
                                           "tf")).alias("h"),
                      *[F.sum(F.when(F.col("field") == f_, F.col("tf")))
                        .alias(f"t_{i}") for i, f_ in enumerate(fields)]))
        (bucketed_repartition(p, self.n_buckets)
         .write.mode("overwrite").partitionBy("field", "tb")
         .parquet(f"{seg}/postings"))
        # no-text-field schema: the postings plan is an empty literal
        # frame that never references the batch, so the input observation
        # would never resolve — count directly (edge case, tiny frames)
        n_docs = (int(in_obs.get["n_docs"] or 0) if in_obs is not None
                  else batch_df.count())
        if n_docs == 0:
            # empty replay/tail batch: drop the empty postings dir so the
            # segment never gains a commit marker and stays invisible
            import shutil
            shutil.rmtree(seg, ignore_errors=True)
            return
        m = obs.get
        with open(f"{seg}/stats.json", "w") as fh:
            json.dump({"n_docs": n_docs, "epoch": epoch_id,
                       "n_buckets": self.n_buckets,
                       "content_hash": int(m["h"] or 0),
                       "fields": {f_: {"total_len": int(m[f"t_{i}"] or 0)}
                                  for i, f_ in enumerate(fields)}}, fh)
        _atomic_success(seg)
        self._lineage(epoch_id, n_docs,
                      _written_partition_counts(f"{seg}/postings"))

    def _lineage(self, epoch_id: int, n_docs: int,
                 part_counts: list) -> None:
        """Per-batch lineage + metrics (north rule: resumable with
        per-partition lineage).  The input slice is the checkpoint's
        source offsets (authoritative); ``partitions`` records the
        written segment layout — posting rows per (field, term-bucket)
        partition, from parquet footers (metadata-only, no scan)."""
        # source offsets for this epoch from the streaming checkpoint — the
        # authoritative record of which input slice fed the segment
        # (input_file_name() is blank after stateful operators)
        offsets = None
        try:
            with open(f"{self.checkpoint}/offsets/{epoch_id}") as fh:
                offsets = [line.strip() for line in fh if line.strip()][-1]
        except OSError:
            pass
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


def _manifest_path(index_path: str) -> str:
    return f"{index_path}/_MANIFEST.json"


def _read_manifest(index_path: str) -> dict | None:
    try:
        with open(_manifest_path(index_path)) as fh:
            return json.load(fh)
    except OSError:
        return None


def _write_manifest(index_path: str, live: list, retired: list, gen: int) -> None:
    """Atomic manifest swap (tmp + rename): readers either see the old
    segment set or the new one, never a partial state."""
    tmp = _manifest_path(index_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"live": sorted(live), "retired": sorted(set(retired)),
                   "gen": gen}, fh)
    os.replace(tmp, _manifest_path(index_path))


def _committed_segments(index_path: str) -> list:
    """Live segments = manifest list (when present) plus any
    marker-committed segment dirs the manifest doesn't know about yet
    (streaming appends land new epochs without touching the manifest)."""
    base = f"{index_path}/segments"
    if not os.path.isdir(base):
        return []
    marker_committed = []
    for d in sorted(os.listdir(base)):
        # "__compacting" working dirs are never live even when they
        # already carry a commit marker: the marker is written BEFORE
        # the rename to the final path, so a crash inside that window
        # leaves a marked working dir whose SOURCES are still
        # manifest-live — surfacing it would double those postings
        # (kill-mid-swap soak, round 4).  The restart path rmtree's it.
        if d.endswith("__compacting"):
            continue
        p = os.path.join(base, d)
        if os.path.exists(os.path.join(p, "_SEGMENT_COMMITTED")):
            marker_committed.append(d)
    man = _read_manifest(index_path)
    if man is None:
        return [os.path.join(base, d) for d in marker_committed]
    live = [d for d in man["live"] if os.path.isdir(os.path.join(base, d))]
    known = set(man["live"]) | set(man.get("retired", []))
    live += [d for d in marker_committed if d not in known]
    return [os.path.join(base, d) for d in sorted(set(live))]


def insert_docs(spark: SparkSession, index_path: str, docs: DataFrame,
                schema: IndexSchema, n_buckets: int = N_TERM_BUCKETS) -> str:
    """Batch insert (reference aminsert outside the stream): write one
    new marker-committed segment from ``docs`` (keyed rows, schema's
    key_field present).  Re-inserting an existing key adds a NEW VERSION
    in a newer segment; together with :func:`delete_docs` on the old key
    this is the reference's UPDATE flow (mutable-toast.out: the new row
    version is visible, the tombstoned old one is not).  Returns the new
    segment path."""
    # a new segment's name must be UNKNOWN to the manifest: a retired
    # name is invisible by the marker-union rule (reusing epoch=i0 after
    # a compaction retired it would silently swallow the insert —
    # mutable-toast-vacuum churn), and any on-disk dir is off-limits too
    existing = {os.path.basename(s) for s in _committed_segments(index_path)}
    man = _read_manifest(index_path)
    if man is not None:
        existing |= set(man["live"]) | set(man.get("retired", []))
    seg_base = f"{index_path}/segments"
    if os.path.isdir(seg_base):
        existing |= set(os.listdir(seg_base))
    n = 0
    while f"epoch=i{n}" in existing:
        n += 1
    seg = f"{index_path}/segments/epoch=i{n}"
    n_docs = docs.count()
    from sparksearch.index import bucketed_repartition
    p = (postings_df(docs, schema)
         .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets))))
    (bucketed_repartition(p, n_buckets)
     .write.mode("overwrite").partitionBy("field", "tb")
     .parquet(f"{seg}/postings"))
    postings = spark.read.parquet(f"{seg}/postings")
    stats = (postings.groupBy("field")
             .agg(F.sum("tf").alias("total_len")).collect())
    with open(f"{seg}/stats.json", "w") as fh:
        json.dump({"n_docs": n_docs, "epoch": f"i{n}",
                   "n_buckets": n_buckets,
                   "content_hash": segment_content_hash(postings),
                   "fields": {r["field"]: {"total_len": r["total_len"]}
                              for r in stats}}, fh)
    _atomic_success(seg)
    return seg


def delete_docs(spark: SparkSession, index_path: str, doc_ids: list) -> int:
    """Logical delete (reference ambulkdelete, postgres/delete.rs):
    tombstones are appended under ``_deletes/`` and filtered out of every
    read; compaction applies them physically (vacuum analog).

    Tombstones are SCOPED to the segments alive at delete time (one
    (doc_id, seg) row per victim × live segment) — Lucene/Tantivy
    deletes hide the doc VERSIONS that exist when the delete lands, so a
    later re-ingest of the same key (the reference's UPDATE flow: new
    row version + dead old version, mutable-toast.out) stays visible."""
    segs = [os.path.basename(s) for s in _committed_segments(index_path)]
    if not segs:
        return 0
    df = spark.createDataFrame([(d, s) for d in doc_ids for s in segs],
                               "doc_id string, seg string")
    df.coalesce(1).write.mode("append").parquet(f"{index_path}/_deletes")
    return len(doc_ids)


def _deletes_df(spark: SparkSession, index_path: str) -> DataFrame | None:
    """(doc_id, seg) tombstone pairs, or None when no deletes exist."""
    p = f"{index_path}/_deletes"
    if os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p)):
        return spark.read.parquet(p).select("doc_id", "seg").distinct()
    return None


def _scoped_anti_join(postings: DataFrame, deletes: DataFrame) -> DataFrame:
    """Drop postings rows whose (doc_id, origin segment) is tombstoned.
    ``postings`` must carry a ``__seg`` column (origin segment name)."""
    d = deletes.select(F.col("doc_id").alias("__del_doc"),
                       F.col("seg").alias("__del_seg"))
    return postings.join(
        d, (postings["doc_id"] == F.col("__del_doc"))
        & (postings["__seg"] == F.col("__del_seg")), "left_anti")


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
        [spark.read.parquet(f"{s}/postings")
         .withColumn("__seg", F.lit(os.path.basename(s))) for s in segs])
    deletes = _deletes_df(spark, index_path)
    n_deleted = 0
    if deletes is not None:
        postings = _scoped_anti_join(postings, deletes)
        n_deleted = deletes.select("doc_id").distinct().count()
    postings = postings.drop("__seg")
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
    elif deletes is not None:
        # a caller-provided doc table must see tombstones too, or
        # aggregates over it count deleted rows the search path already
        # filters (reference: COUNT/value_count/stats return 1 after
        # deleting 4 of 5 rows, aggregate_edgecases.out section 2).
        # Only keys with NO surviving version are hidden — an updated
        # key (tombstoned old version + live re-ingest) stays visible.
        key = schema.key_field
        dead = (deletes.select("doc_id").distinct()
                .join(postings.select("doc_id").distinct(),
                      "doc_id", "left_anti"))
        docs = docs.join(
            dead.select(F.col("doc_id").alias("__del_id")),
            docs[key].cast("string") == F.col("__del_id"), "left_anti")
    # bucket pruning only when every segment shares one modulus
    nb = buckets.pop() if len(buckets) == 1 else None
    return SearchIndex(spark, schema, docs, postings, corpus_stats, meta,
                       n_buckets=nb)


def _merge_into_segment(spark: SparkSession, index_path: str, segs: list,
                        out_name: str, apply_deletes: bool,
                        remove_sources: bool = True) -> str:
    """Merge ``segs`` into one new segment, committed crash-safely:

    1. write merged postings + stats + commit marker to the NEW dir;
    2. atomically swap the manifest (live = old − merged + new) —
       this is the commit point; a crash before it leaves the old
       segments live, a crash after it leaves the new set live;
    3. with ``remove_sources`` (batch contexts), best-effort delete of
       the retired dirs (re-deletable on retry; readers resolve from the
       manifest so leftovers are invisible).  Continuous-ingest contexts
       (compact_layered) pass False so IN-FLIGHT readers whose plans
       still reference the retired files keep working — Iceberg's
       snapshot-expiry model; :func:`vacuum_retired` reclaims the space
       once concurrent readers have drained.
    """
    import shutil
    from functools import reduce
    base = f"{index_path}/segments"
    final = os.path.join(base, out_name)
    merged = final + "__compacting"
    shutil.rmtree(merged, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)

    postings = reduce(lambda a, b: a.unionByName(b),
                      [spark.read.parquet(f"{s}/postings")
                       .withColumn("__seg", F.lit(os.path.basename(s)))
                       for s in segs])
    # a merge ALWAYS drops its sources' tombstoned rows physically
    # (Lucene/Tantivy merge semantics): once old and new VERSIONS of a
    # re-ingested key share one merged segment, a (doc_id, seg)-scoped
    # tombstone could no longer tell them apart, so the dead version
    # must not survive the rewrite.  Tombstones scoped to segments
    # outside this merge stay behind and keep working.
    deletes = _deletes_df(spark, index_path)
    applied_deletes = False
    if deletes is not None:
        src_names = [os.path.basename(s) for s in segs]
        scoped = deletes.filter(F.col("seg").isin(src_names))
        if scoped.limit(1).count():
            postings = _scoped_anti_join(postings, scoped)
            applied_deletes = True
    postings = postings.drop("__seg")
    from sparksearch.index import bucketed_repartition
    (bucketed_repartition(postings, 16)
     .write.mode("overwrite").partitionBy("field", "tb")
     .parquet(f"{merged}/postings"))
    seg_buckets = set()
    for s in segs:
        with open(f"{s}/stats.json") as fh:
            seg_buckets.add(json.load(fh).get("n_buckets"))
    nb = seg_buckets.pop() if len(seg_buckets) == 1 else None
    if applied_deletes:
        # vacuum: recompute exact stats from the surviving postings
        written = spark.read.parquet(f"{merged}/postings")
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
        json.dump({"n_docs": n_docs, "epoch": out_name, "n_buckets": nb,
                   "content_hash": segment_content_hash(
                       spark.read.parquet(f"{merged}/postings")),
                   "fields": {f_: {"total_len": t} for f_, t in totals.items()}},
                  fh)
    # Two-phase commit (Iceberg pending-snapshot pattern).  Phase 1
    # pre-declares out_name in the manifest's RETIRED set ("known, not
    # live"): the marker-union rule in _committed_segments only surfaces
    # marker-committed dirs the manifest does NOT know, so the new dir
    # can carry its commit marker from the moment it appears at its
    # final path without manifest readers ever seeing old + new
    # together.  The marker is written BEFORE the rename, so there is no
    # crash window leaving a manifest-live segment unmarked — a
    # manifest-less fallback reader (deleted/corrupt manifest) never
    # drops the merged segment, which after source cleanup may be the
    # only copy.
    merged_names = {os.path.basename(s) for s in segs}
    live_now = {os.path.basename(s) for s in _committed_segments(index_path)}
    man = _read_manifest(index_path) or {"retired": [], "gen": 0}
    retired0 = set(man.get("retired", []))
    _write_manifest(index_path, list(live_now),
                    list(retired0 | {out_name}), man.get("gen", 0) + 1)
    _atomic_success(merged)
    os.rename(merged, final)

    # Phase 2 — commit point: flip out_name from retired to live and
    # retire the merged sources; atomic for manifest readers.
    new_live = (live_now - merged_names) | {out_name}
    _write_manifest(index_path, list(new_live),
                    list((retired0 | merged_names) - {out_name}),
                    man.get("gen", 0) + 2)

    if remove_sources:
        for s in segs:
            shutil.rmtree(s, ignore_errors=True)
    if apply_deletes:
        # full compaction merged every committed segment, so no
        # tombstone can reference a surviving source — clear them all
        shutil.rmtree(f"{index_path}/_deletes", ignore_errors=True)
    return final


def vacuum_retired(index_path: str) -> int:
    """Physically delete retired segment directories (Iceberg
    expire-snapshots analog).  Retired dirs are invisible to every
    manifest reader already; call this once in-flight readers that may
    still reference the old files have drained.  Returns the number of
    directories removed."""
    import shutil
    man = _read_manifest(index_path)
    if not man:
        return 0
    n = 0
    for name in man.get("retired", []):
        p = os.path.join(index_path, "segments", name)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            n += 1
    # orphaned "__compacting" working dirs (a compactor crashed between
    # marker write and rename) are invisible to readers but hold space —
    # reclaim them here too
    base = os.path.join(index_path, "segments")
    if os.path.isdir(base):
        for d in os.listdir(base):
            if d.endswith("__compacting"):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                n += 1
    return n


def _next_gen(index_path: str) -> int:
    man = _read_manifest(index_path)
    return (man.get("gen", 0) + 1) if man else 1


def compact_segments(spark: SparkSession, index_path: str,
                     schema: IndexSchema) -> str:
    """Merge all committed segments into one base segment (full
    compaction — Iceberg's rewrite_data_files equivalent).  For
    continuous ingest at scale use ``compact_layered`` instead, which
    never rewrites the whole index."""
    segs = _committed_segments(index_path)
    if len(segs) <= 1:
        return segs[0] if segs else ""
    return _merge_into_segment(spark, index_path, segs,
                               f"epoch=c{_next_gen(index_path)}",
                               apply_deletes=True)


def _segment_bytes(seg: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(os.path.join(seg, "postings")):
        for f_ in files:
            if not f_.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f_))
    return total


def compact_layered(spark: SparkSession, index_path: str, schema: IndexSchema,
                    layer_sizes: list | None = None,
                    min_merge_count: int = 2) -> list:
    """Tiered merge policy (reference: LayeredMergePolicy,
    pg_search/src/index/merge_policy.rs:31-60 and candidate computation
    at :246-300): for each layer size, largest first, greedily group
    segments no bigger than the layer until the group's total bytes
    reach layer_size + layer_size/3, then merge that group into one new
    segment.  Groups that never fill their layer, or with fewer than
    ``min_merge_count`` members, are left alone — so steady-state work
    per compaction is O(one layer), never a full index rewrite.

    Returns the list of newly written segment paths.
    """
    candidates = merge_candidates(index_path, layer_sizes, min_merge_count)
    out = []
    gen = _next_gen(index_path)
    for i, cand in enumerate(candidates):
        out.append(_merge_into_segment(
            spark, index_path, cand["segments"], f"epoch=c{gen}_{i}",
            apply_deletes=False, remove_sources=False))
    return out


DEFAULT_LAYER_SIZES = [100 * 1024, 1024 * 1024, 10 * 1024 * 1024]


def merge_candidates(index_path: str, layer_sizes: list | None = None,
                     min_merge_count: int = 2) -> list:
    """Simulate the layered policy without merging (the reference's
    LayeredMergePolicy::simulate / paradedb.merge_info analog).  Returns
    [{"layer": bytes, "segments": [...], "bytes": total}]."""
    if layer_sizes is None:
        from sparksearch.config import CONFIG
        layer_sizes = CONFIG.layer_sizes
    segs = _committed_segments(index_path)
    if len(segs) < min_merge_count:
        return []
    sizes = {s: _segment_bytes(s) for s in segs}
    candidates: list = []
    used: set = set()
    for layer in sorted(layer_sizes, reverse=True):
        extended = layer + layer // 3
        group: list = []
        group_bytes = 0
        # largest → smallest, like the reference's collect_mergeable_segments
        for s in sorted((x for x in segs if x not in used),
                        key=lambda x: -sizes[x]):
            if sizes[s] > layer:
                continue
            group.append(s)
            group_bytes += sizes[s]
            if group_bytes >= extended:
                candidates.append({"layer": layer, "segments": group,
                                   "bytes": group_bytes})
                used.update(group)
                group, group_bytes = [], 0
        # partial group: not enough bytes to graduate this layer — skip
    return [c for c in candidates if len(c["segments"]) >= min_merge_count]
