"""User-facing API functions mirroring the reference's SQL surface.

- :func:`tokenize` — ``paradedb.tokenize(tokenizer, text)`` (api/tokenize.rs:23-47)
- :func:`tokenizers` — ``paradedb.tokenizers()`` listing (api/tokenize.rs:49-56)
- :func:`index_info` / :func:`index_fields` / :func:`index_segments` /
  :func:`storage_info` — the admin/introspection family
  (api/admin.rs: paradedb.index_info, index_fields, index_segments,
  storage_info) over our parquet-segment layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from sparksearch.analysis import py_tokenize, tokenizers  # noqa: F401


def tokenize(spark: SparkSession, tokenizer: str, text: str,
             **opts) -> DataFrame:
    """Token inspection: returns (token, position) rows, like
    ``SELECT * FROM paradedb.tokenize('default', 'hello world')``."""
    toks = py_tokenize(text, tokenizer, opts or None, lowercase=True)
    rows = [(t, i) for i, t in enumerate(toks)]
    return spark.createDataFrame(rows or [], "token string, position int")


def index_fields(index) -> list:
    """Per-field config of an index (paradedb.index_fields analog)."""
    return [{
        "name": f.name, "tokenizer": f.tokenizer,
        "tokenizer_opts": dict(f.tokenizer_opts), "record": f.record,
        "fast": f.fast, "lowercase": f.lowercase,
    } for f in index.schema.text_fields]


def index_info(index) -> dict:
    """Corpus-level stats (paradedb.index_info analog)."""
    terms = {r["field"]: r["n"] for r in
             index.corpus_stats.groupBy("field").count()
             .withColumnRenamed("count", "n").collect()}
    return {
        "key_field": index.schema.key_field,
        "fields": {f: {"num_docs": m["num_docs"],
                       "avg_len": m["avg_len"],
                       "distinct_terms": terms.get(f, 0)}
                   for f, m in index.meta.items()},
    }


def index_segments(index_path: str) -> list:
    """Per-segment metadata of a streaming index
    (paradedb.index_segments / merge_info analog)."""
    base = f"{index_path}/segments"
    out = []
    if not os.path.isdir(base):
        return out
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        stats = os.path.join(p, "stats.json")
        if os.path.exists(stats):
            with open(stats) as fh:
                st = json.load(fh)
            st["committed"] = os.path.exists(
                os.path.join(p, "_SEGMENT_COMMITTED"))
            st["path"] = p
            out.append(st)
    return out


def storage_info(index_path: str) -> dict:
    """Bytes on disk per segment (paradedb.storage_info analog)."""
    out = {}
    for seg in index_segments(index_path):
        total = 0
        for root, _, files in os.walk(seg["path"]):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        out[seg["path"]] = total
    return out
