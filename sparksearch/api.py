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

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparksearch.analysis import py_tokenize, tokenizers  # noqa: F401


# token-filter options accepted by tokenize(), applied in the
# reference's FIXED chain order (tokenizers/src/manager.rs:315-337:
# token_length -> trim -> lower_caser -> stemmer -> stopwords ->
# ascii_folding -> alpha_num_only, then stopwords_language filters are
# appended DYNAMICALLY after the static chain — i.e. LAST, so language
# stopword lists are checked against the folded/alpha-num-filtered
# token form) regardless of kwarg order — option order never changes
# semantics, exactly like the reference.
_FILTER_ORDER = ("remove_short", "remove_long", "trim", "lowercase",
                 "stemmer", "stopwords", "ascii_folding",
                 "alpha_num_only", "stopwords_language")


def tokenize(spark: SparkSession, tokenizer: str, text: str,
             **opts) -> DataFrame:
    """Token inspection: returns (token, position) rows, like
    ``SELECT * FROM paradedb.tokenize(paradedb.tokenizer('default',
    ascii_folding => true), 'café')`` — filter kwargs build the same
    fixed-order chain the reference's tokenizer builder applies
    (ascii_folding_filter.out, token_length_filter.out)."""
    from sparksearch.analysis import py_analyze
    from sparksearch.schema import FieldConfig
    filters = []
    tok_opts = dict(opts)
    lowercase = bool(tok_opts.pop("lowercase", True))
    for name in _FILTER_ORDER:
        if name in ("lowercase",) or name not in tok_opts:
            continue
        arg = tok_opts.pop(name)
        if arg is False or arg is None:
            continue
        filters.append((name, None) if arg is True else (name, arg))
    cfg = FieldConfig(name="_t", tokenizer=tokenizer,
                      tokenizer_opts=tok_opts, filters=filters or None,
                      lowercase=lowercase)
    rows = [(t, p) for t, p in py_analyze(text, cfg)]
    return spark.createDataFrame(rows or [], "token string, position int")


def aggregate(index, query, aggs: dict):
    """``paradedb.aggregate(index, query, aggs_json)`` analog: run an
    ES-style aggregation request over the docs a query matches and
    return the result envelope dict.

    An EMPTY index returns ``None`` — the SQL ``null`` the reference
    emits for every aggregate shape over a zero-segment index
    (empty_aggregate.out sections 4-5); zero MATCHES over a non-empty
    index still return a real envelope (zero counts / null metrics),
    like an Elasticsearch response with hits=0.
    """
    from sparksearch.aggs import search_aggregate
    if index.docs.limit(1).count() == 0:
        return None
    # left_semi join (via search_aggregate) keeps index.docs' columns
    # intact — including the key field — so agg specs referencing the
    # key (e.g. {"value_count": {"field": "id"}}, as datetime_stability
    # section 9 runs) resolve instead of hitting an unresolved column.
    return search_aggregate(index, query, aggs)


def rel_get_bm25_index(indexes: list):
    """``rel_get_bm25_index`` analog (multi_bm25_index.out): a relation
    normally has ONE bm25 index, but during the build-new/swap/drop-old
    workflow (CREATE INDEX CONCURRENTLY) two coexist — queries resolve
    against the HIGHEST-OID (newest) index, so a field that only the new
    index knows about works mid-swap."""
    if not indexes:
        raise ValueError("relation has no bm25 index")
    return max(indexes, key=lambda i: i.oid)


def index_fields(index) -> list:
    """Per-field config of an index (paradedb.index_fields analog)."""
    return [{
        "name": f.name, "tokenizer": f.tokenizer,
        "tokenizer_opts": dict(f.tokenizer_opts), "record": f.record,
        "fast": f.fast is not False, "lowercase": f.lowercase,
    } for f in index.schema.text_fields]


def _tokenizer_descriptor(cfg) -> str:
    """The reference's tokenizer descriptor string as shown by
    ``paradedb.schema()`` (tokenize-uuid.out): e.g.
    ``keyword[lowercase=false]``, ``unicode_words_removeemojis:false``,
    ``ngram_mingram:3_maxgram:3_prefixonly:false``."""
    t, o = cfg.tokenizer, cfg.tokenizer_opts
    if t == "json":
        # JSON fields display their VALUE tokenizer (tokenizer-json.out:
        # bare json columns show unicode_words_removeemojis:false, a
        # pdb.ngram(2,3) cast shows ngram_mingram:2_...)
        from dataclasses import replace
        vt = o.get("value_tokenizer", "unicode_words")
        vo = {k: v for k, v in o.items() if k != "value_tokenizer"}
        return _tokenizer_descriptor(
            replace(cfg, tokenizer=vt, tokenizer_opts=vo))
    if t in ("keyword", "raw", "literal"):
        return f"keyword[lowercase={str(bool(cfg.lowercase)).lower()}]"
    if t == "literal_normalized":
        return "keyword[lowercase=true]"
    if t == "unicode_words":
        return ("unicode_words_removeemojis:"
                + str(bool(o.get("remove_emojis"))).lower())
    if t == "ngram":
        return (f"ngram_mingram:{o.get('min_gram', 2)}"
                f"_maxgram:{o.get('max_gram', 3)}"
                f"_prefixonly:{str(bool(o.get('prefix_only'))).lower()}")
    if t == "regex":
        return f"regex_pattern:{o.get('pattern', '')}"
    return t


def schema(index) -> list:
    """``paradedb.schema(index)`` analog: one row per indexed field with
    its type, storage flags, tokenizer descriptor, record level, and
    normalizer (tokenize-uuid.out column set)."""
    key = index.schema.key_field
    cfg_names = {f.name for f in index.schema.text_fields}
    out = []
    if key not in cfg_names:
        # untokenized key: typed by the doc column (a TEXT key defaults
        # to the keyword tokenizer + raw normalizer and shows as Str —
        # key-field-text-as-keyword.out)
        dt = dict(index.docs.dtypes).get(key, "bigint")
        ft = ("Str" if dt in ("string", "varchar") else
              "F64" if dt in ("double", "float") else
              "Bool" if dt == "boolean" else
              "Date" if dt in ("date", "timestamp") else "I64")
        out.append({"name": key, "field_type": ft,
                    "stored": False, "indexed": True, "fast": True,
                    "tokenizer": ("keyword[lowercase=false]"
                                  if ft == "Str" else None),
                    "record": "position" if ft == "Str" else None,
                    "normalizer": "raw" if ft == "Str" else None})
    for f in index.schema.text_fields:
        is_json = f.tokenizer == "json"
        out.append({
            "name": f.name,
            # JSON columns type as JsonObject with expand_dots
            # (tokenizer-json.out schema dump)
            "field_type": "JsonObject" if is_json else "Str",
            "stored": False,
            "indexed": f.indexed,
            # the key field is ALWAYS fast (every scan resolves it);
            # JsonObject fields are not fast in the reference dump
            "fast": (f.fast is not False or f.name == key) and not is_json,
            "expand_dots": True if is_json else None,
            "tokenizer": _tokenizer_descriptor(f), "record": f.record,
            "normalizer": ("raw" if f.tokenizer in
                           ("keyword", "raw", "literal") else
                           "lowercase" if f.lowercase else None),
        })
    return out


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
    from sparksearch.streaming.indexer import _committed_segments
    live = set(_committed_segments(index_path))
    for d in sorted(os.listdir(base)):
        p = os.path.join(base, d)
        stats = os.path.join(p, "stats.json")
        if os.path.exists(stats):
            with open(stats) as fh:
                st = json.load(fh)
            st["committed"] = os.path.exists(
                os.path.join(p, "_SEGMENT_COMMITTED"))
            st["live"] = p in live
            st["path"] = p
            out.append(st)
    # ordinal ids for manual parallel verification (pdb.index_segments
    # segment_idx, verify_bm25_index.out Tests 9-10): sequential from 0
    # over the LIVE segments, in listing order
    idx = 0
    for st in out:
        if st["live"]:
            st["segment_idx"] = idx
            idx += 1
    return out


def find_ctid(spark: SparkSession, index_path: str, ctid: str) -> DataFrame:
    """``paradedb.find_ctid(index, '(block, offset)')`` analog
    (find_ctid.out; api/admin.rs find_ctid): resolve a physical doc
    address to the doc key stored there.

    The engine's stable physical address is ``(segment_idx, ordinal)``:
    ``segment_idx`` is the live-segment ordinal ``index_segments``
    reports, and ``ordinal`` is the 1-based position of the doc key in
    the segment's byte-ordered distinct key list (the order the direct
    writer lays docs down).  Tombstoned keys no longer resolve — the
    reference's dead-ctid behavior.  Returns a 0-or-1-row DataFrame
    with the resolved ``doc_id`` (count it for the golden's
    ``SELECT count(*)`` form).
    """
    m = ctid.strip()
    if not (m.startswith("(") and m.endswith(")")):
        raise ValueError(f"malformed ctid: {ctid!r}")
    try:
        block, offset = (int(p.strip()) for p in m[1:-1].split(","))
    except Exception as exc:
        raise ValueError(f"malformed ctid: {ctid!r}") from exc
    live = [s for s in index_segments(index_path) if s.get("live")]
    seg = next((s for s in live if s.get("segment_idx") == block), None)
    empty = spark.createDataFrame([], "doc_id string")
    if seg is None or offset < 1:
        return empty
    keys = (spark.read.parquet(f"{seg['path']}/postings")
            .select(F.col("doc_id").cast("string").alias("doc_id"))
            .distinct())
    from sparksearch.streaming.indexer import _deletes_df
    deletes = _deletes_df(spark, index_path)
    if deletes is not None:
        # tombstones are (doc_id, seg)-scoped — only this segment's hide
        seg_name = os.path.basename(seg["path"])
        keys = keys.join(
            deletes.filter(F.col("seg") == seg_name)
            .select(F.col("doc_id").cast("string").alias("doc_id")),
            "doc_id", "left_anti")
    # distributed ordinal resolution: global byte-order sort absorbed by
    # TakeOrderedAndProject (offset+limit pushed, no full materialize)
    return keys.orderBy("doc_id").offset(offset - 1).limit(1)


def storage_info(index_path: str) -> dict:
    """Bytes on disk per segment (paradedb.storage_info analog)."""
    out = {}
    for seg in index_segments(index_path):
        total = 0
        for root, _, files in os.walk(seg["path"]):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        out[seg["path"]] = total
    return out


def verify_index(index) -> dict:
    """Index-integrity checks (paradedb.verify_index analog,
    api/admin.rs): postings ↔ corpus_stats ↔ meta consistency, all as
    distributed aggregations.  Returns {check: {"ok": bool, ...}}."""
    from pyspark.sql import functions as F
    out = {}
    p, cs = index.postings, index.corpus_stats
    # 1. df(term) in corpus_stats == distinct docs in postings
    pdf = (p.groupBy("field", "term")
           .agg(F.countDistinct("doc_id").alias("df_p"),
                F.sum("tf").alias("tf_p")))
    joined = pdf.join(cs, ["field", "term"], "full")
    bad = joined.filter(
        F.col("df_p").isNull() | F.col("df").isNull()
        | (F.col("df_p") != F.col("df"))
        | (F.col("tf_p") != F.col("total_tf"))).count()
    out["corpus_stats_consistent"] = {"ok": bad == 0, "bad_terms": bad}
    # 2. meta totals match postings
    totals = {r["field"]: r["t"] for r in
              p.groupBy("field").agg(F.sum("tf").alias("t")).collect()}
    meta_ok = all(
        abs(m["avg_len"] * m["num_docs"] - (totals.get(f, 0) or 0))
        <= max(1e-6, 1e-9 * (totals.get(f, 0) or 0))
        for f, m in index.meta.items())
    # (legitimately not-ok between a logical delete and its vacuum:
    # per-segment stats stay approximate until compaction, by design)
    out["meta_consistent"] = {"ok": meta_ok}
    # 3. structural invariants: no null/empty terms, tf >= 1, positions
    #    (when present) sorted with length == tf
    pos_ok = F.col("positions").isNull() | (
        (F.size("positions") == F.col("tf"))
        & (F.col("positions") == F.array_sort("positions")))
    bad_rows = p.filter(
        F.col("term").isNull() | (F.length("term") == 0)
        | (F.col("tf") < 1) | ~pos_ok).count()
    out["postings_wellformed"] = {"ok": bad_rows == 0, "bad_rows": bad_rows}
    # 4. bucket layout: tb == hash(term) % n_buckets for every row
    if index.bucketed:
        mis = p.filter(
            F.col("tb") != F.pmod(F.xxhash64("term"),
                                  F.lit(index.n_buckets))).count()
        out["bucket_layout"] = {"ok": mis == 0, "misplaced": mis}
    out["ok"] = all(v["ok"] for v in out.values() if isinstance(v, dict))
    return out


def validate_checksum(spark: SparkSession, index_path: str) -> dict:
    """Recompute each committed segment's content hash and compare with
    the one stored at write time (paradedb.validate_checksum analog)."""
    from sparksearch.streaming.indexer import (_committed_segments,
                                               segment_content_hash)
    out = {}
    for seg in _committed_segments(index_path):
        with open(f"{seg}/stats.json") as fh:
            st = json.load(fh)
        stored = st.get("content_hash")
        actual = segment_content_hash(spark.read.parquet(f"{seg}/postings"))
        out[seg] = {"ok": stored is None or stored == actual,
                    "stored": stored, "actual": actual}
    out["ok"] = all(v["ok"] for v in out.values() if isinstance(v, dict))
    return out


def merge_info(index_path: str, layer_sizes: list | None = None) -> dict:
    """Live/retired segment sets + what the layered policy would merge
    next (paradedb.merge_info analog)."""
    from sparksearch.streaming.indexer import (_committed_segments,
                                               _read_manifest,
                                               merge_candidates)
    man = _read_manifest(index_path) or {}
    return {
        "live": [os.path.basename(s) for s in _committed_segments(index_path)],
        "retired": man.get("retired", []),
        "generation": man.get("gen", 0),
        "candidates": merge_candidates(index_path, layer_sizes),
    }


def version_info() -> dict:
    """``paradedb.version_info()`` analog."""
    import sparksearch
    import pyspark
    return {"version": getattr(sparksearch, "__version__", "0.3.0"),
            "backend": "pyspark", "pyspark": pyspark.__version__}


def force_merge(spark: SparkSession, index_path: str, schema,
                oneshot: bool = False) -> dict:
    """``paradedb.force_merge(index)`` analog (api/admin.rs): run the
    layered merge policy now — or, with ``oneshot=True``, merge every
    committed segment into one base segment (the full-compaction form,
    applying tombstones physically)."""
    from sparksearch.streaming.indexer import (compact_layered,
                                               compact_segments,
                                               _committed_segments)
    before = len(_committed_segments(index_path))
    if oneshot:
        written = [compact_segments(spark, index_path, schema)]
    else:
        written = compact_layered(spark, index_path, schema)
    return {"segments_before": before,
            "segments_after": len(_committed_segments(index_path)),
            "new_segments": [os.path.basename(w) for w in written if w]}


def verify_index_report(spark: SparkSession, index_path: str,
                        index_name: str | None = None, *,
                        heapallindexed: bool = False,
                        sample_rate: float | None = None,
                        segment_ids: list | None = None,
                        on_error_stop: bool = False,
                        heap=None, key_field: str = "doc_id") -> list:
    """amcheck-style verification rows (paradedb.verify_index analog,
    verify_bm25_index.out): one row per check, in the reference's
    natural check order — schema_valid, index_readable, checksums_valid,
    segment_metadata_valid, then (with ``heapallindexed``)
    ctid_field_valid and heap_references_valid.

    - ``segment_ids`` filters segment_metadata_valid to the given
      segment ordinals; details read "K of N segments validated" when
      filtered and "N segments validated" when not (the reference's
      partial-verification indicator).
    - ``heapallindexed`` adds the heap cross-checks: the key column is
      the ctid analog (ctid_field_valid = every posting carries a
      well-formed key) and heap_references_valid anti-joins the index's
      live keys against ``heap`` — an indexed key missing from the heap
      is the reference's dangling-entry corruption ("X of Y" details).
    - ``sample_rate`` verifies a deterministic sample of the keys and
      marks the details "sampled".
    - ``on_error_stop`` stops after the first failed check.
    """
    from sparksearch.streaming.indexer import _committed_segments
    name = index_name or os.path.basename(index_path.rstrip("/"))
    segs = _committed_segments(index_path)
    rows: list = []

    def emit(check: str, passed: bool, details: str = "") -> bool:
        rows.append({"check_name": f"{name}: {check}",
                     "passed": bool(passed), "details": details})
        return not passed and on_error_stop

    # 1. schema_valid: every live segment's stats.json is well-formed
    bad = []
    for s in segs:
        try:
            with open(f"{s}/stats.json") as fh:
                st = json.load(fh)
            if not isinstance(st.get("n_docs"), int) or "fields" not in st:
                bad.append(os.path.basename(s))
        except (OSError, ValueError):
            bad.append(os.path.basename(s))
    if emit("schema_valid", not bad,
            f"malformed segment metadata: {bad}" if bad
            else f"{len(segs)} segments"):
        return rows

    # 2. index_readable: every live segment's postings parquet opens
    unreadable = []
    for s in segs:
        try:
            spark.read.parquet(f"{s}/postings").limit(1).count()
        except Exception:
            unreadable.append(os.path.basename(s))
    if emit("index_readable", not unreadable,
            f"unreadable segments: {unreadable}" if unreadable else ""):
        return rows

    # 3. checksums_valid: stored vs recomputed segment content hashes
    ck = validate_checksum(spark, index_path)
    bad_ck = [k for k, v in ck.items()
              if isinstance(v, dict) and not v["ok"]]
    if emit("checksums_valid", not bad_ck,
            f"checksum mismatch: {bad_ck}" if bad_ck else ""):
        return rows

    # 4. segment_metadata_valid (segment_ids filtering semantics)
    meta = index_segments(index_path)
    live = [m for m in meta if m.get("live")]
    if segment_ids is None:
        checked = live
        details = f"{len(checked)} segments validated"
    else:
        wanted = set(segment_ids)
        checked = [m for i, m in enumerate(live) if i in wanted]
        details = f"{len(checked)} of {len(live)} segments validated"
    ok = all(m.get("committed") and isinstance(m.get("n_docs"), int)
             for m in checked)
    if emit("segment_metadata_valid", ok, details):
        return rows

    if not heapallindexed:
        return rows

    from functools import reduce
    from pyspark.sql import functions as F
    keys = None
    if segs:
        parts = [spark.read.parquet(f"{s}/postings").select("doc_id")
                 for s in segs]
        keys = reduce(lambda a, b: a.unionByName(b), parts)

    # 5. ctid_field_valid: the key column (ctid analog) is well-formed
    bad_keys = 0 if keys is None else keys.filter(
        F.col("doc_id").isNull()
        | (F.length(F.col("doc_id").cast("string")) == 0)).count()
    if emit("ctid_field_valid", bad_keys == 0,
            f"{bad_keys} postings with malformed keys" if bad_keys
            else ""):
        return rows

    # 6. heap_references_valid: indexed keys must exist in the heap
    if heap is None:
        emit("heap_references_valid", False, "no heap provided")
        return rows
    live_keys = (keys.select(F.col("doc_id").cast("string").alias("k"))
                 .distinct() if keys is not None else None)
    # tombstoned keys are not dangling references
    from sparksearch.streaming.indexer import _deletes_df
    dels = _deletes_df(spark, index_path)
    if live_keys is not None and dels is not None:
        live_keys = live_keys.join(
            dels.select(F.col("doc_id").cast("string").alias("k"))
            .distinct(), "k", "left_anti")
    total = live_keys.count() if live_keys is not None else 0
    sampled = ""
    if sample_rate is not None and live_keys is not None:
        live_keys = live_keys.sample(fraction=float(sample_rate), seed=42)
        sampled = ", sampled"
    hk = heap.select(F.col(key_field).cast("string").alias("__hk"))
    missing = 0 if live_keys is None else live_keys.join(
        hk, live_keys["k"] == F.col("__hk"), "left_anti").count()
    emit("heap_references_valid", missing == 0,
         f"{missing} of {total} indexed documents missing from heap"
         f"{sampled}")
    return rows


def indexes(spark: SparkSession, root: str) -> list:
    """List every streaming index under ``root`` with segment/doc counts
    (paradedb ``pdb.indexes()`` analog, verify_bm25_index.out Test 11)."""
    from sparksearch.streaming.indexer import _committed_segments
    out = []
    if not os.path.isdir(root):
        return out
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d)
        if not os.path.isdir(os.path.join(p, "segments")):
            continue
        segs = _committed_segments(p)
        docs = 0
        for s in segs:
            try:
                with open(f"{s}/stats.json") as fh:
                    docs += json.load(fh).get("n_docs", 0)
            except (OSError, ValueError):
                pass
        out.append({"indexname": d, "num_segments": len(segs),
                    "total_docs": docs, "path": p})
    return out


def verify_all_indexes(spark: SparkSession, root: str,
                       index_pattern: str = "%", **kw) -> list:
    """Verify every index under ``root`` whose name matches the SQL LIKE
    ``index_pattern`` (paradedb ``pdb.verify_all_indexes()`` analog)."""
    import fnmatch
    glob_pat = index_pattern.replace("%", "*").replace("_", "?")
    rows = []
    for ix in indexes(spark, root):
        if not fnmatch.fnmatch(ix["indexname"], glob_pat):
            continue
        for r in verify_index_report(spark, ix["path"],
                                     ix["indexname"], **kw):
            rows.append({"indexname": ix["indexname"], **r})
    return rows


def parse_layer_sizes(raw: str) -> list:
    """Parse the reference's human-readable ``layer_sizes`` WITH-option
    string (layer_size_config.out): comma-separated sizes with b / kb /
    mb / gb / tb suffixes (case-insensitive, optional space, bare
    numbers are bytes).  Zero entries are DROPPED (a no-op layer),
    negatives error with 'a single layer size must be non-negative',
    and anything unparsable errors with the reference's
    ``invalid size: "..."`` — the unparsed text verbatim, leading
    whitespace included."""
    import re as _re
    units = {"": 1, "b": 1, "kb": 1024, "mb": 1024 ** 2,
             "gb": 1024 ** 3, "tb": 1024 ** 4}
    out = []
    for piece in raw.split(","):
        m = _re.fullmatch(r"\s*(-?\d+(?:\.\d+)?)\s*([a-zA-Z]*)\s*",
                          piece)
        if not m or m.group(2).lower() not in units:
            raise ValueError(f'invalid size: "{piece}"')
        n = float(m.group(1)) * units[m.group(2).lower()]
        if n < 0:
            raise ValueError("a single layer size must be non-negative")
        if n > 0:
            out.append(int(n))
    return out


def pg_size_pretty(n: int) -> str:
    """PostgreSQL ``pg_size_pretty`` subset for layer boundaries: unit
    advances (bytes → kB → MB → GB → TB) only once the value reaches
    10240 of the current unit, with PG's half-up shift rounding."""
    units = ["bytes", "kB", "MB", "GB", "TB"]
    v = int(n)
    i = 0
    while i + 1 < len(units) and abs(v) >= 10240:
        v = (v + 512) >> 10
        i += 1
    return f"{v} {units[i]}"


def combined_layer_sizes(foreground: list | str | None,
                         background: list | str | None = None) -> list:
    """``paradedb.combined_layer_sizes`` analog (index_layer_info.out):
    the sorted, deduplicated UNION of the foreground ``layer_sizes`` and
    ``background_layer_sizes`` options — the boundaries every merge
    policy (fg or bg) may produce, hence the buckets index_layer_info
    reports.  '0' disables a list (parse drops zero entries)."""
    def _parse(x):
        if x is None:
            return []
        return parse_layer_sizes(x) if isinstance(x, str) else list(x)
    return sorted(set(_parse(foreground)) | set(_parse(background)))


def index_layer_info(relname: str, sizes: list) -> list:
    """``pdb.index_layer_info`` bucket rows (index_layer_info.out): one
    row per layer interval, largest first — '<top>..', then
    '<lo>..<hi>' pairs, then '..<bottom>' — with pg_size_pretty
    boundary rendering ('1024 kB..10 MB')."""
    ss = sorted(sizes)
    if not ss:
        return []
    rows = [f"{pg_size_pretty(ss[-1])}.."]
    for hi, lo in zip(reversed(ss[1:]), reversed(ss[:-1])):
        rows.append(f"{pg_size_pretty(lo)}..{pg_size_pretty(hi)}")
    rows.append(f"..{pg_size_pretty(ss[0])}")
    return [{"relname": relname, "layer_size": r} for r in rows]


def layer_sizes(index_path: str, sizes: list | str | None = None) -> list:
    """Per-layer segment assignment (paradedb.layer_sizes analog): which
    layer each live segment currently belongs to by byte size."""
    from sparksearch.streaming.indexer import (_committed_segments,
                                               _segment_bytes,
                                               DEFAULT_LAYER_SIZES)
    if isinstance(sizes, str):
        sizes = parse_layer_sizes(sizes)
    sizes = sorted(sizes or DEFAULT_LAYER_SIZES)
    out = []
    for s in _committed_segments(index_path):
        b = _segment_bytes(s)
        layer = next((ls for ls in sizes if b <= ls), None)
        out.append({"segment": os.path.basename(s), "bytes": b,
                    "layer": layer})
    return out
