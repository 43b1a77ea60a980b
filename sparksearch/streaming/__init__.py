"""Structured-Streaming layer: continuous indexing of transcript streams.

Reference analog: the pg_search write path — ``aminsert`` builds an
in-memory Tantivy segment per statement, flushed at a memory budget
(pg_search/src/postgres/insert.rs, index/writer/index.rs:347-399), with an
LSM merge policy (merge_policy.rs:31-60).  Spark restatement: each
micro-batch becomes one immutable segment directory written idempotently
(epoch-keyed), the segmented index is the union of segments with
per-segment stats merged at read time (exactly how Tantivy merges
per-segment doc-freqs at query time), and compaction rewrites small
segments (merge policy analog).
"""

from sparksearch.streaming.indexer import (  # noqa: F401
    StreamingIndexer, open_segmented_index, compact_segments,
    compact_layered, vacuum_retired,
)
from sparksearch.streaming.sessions import conversation_docs  # noqa: F401
from sparksearch.streaming.term_stats import salted_term_stats  # noqa: F401
from sparksearch.streaming.enrich import enrich_with_tool_context  # noqa: F401
from sparksearch.streaming.dedup import streaming_near_duplicates  # noqa: F401
