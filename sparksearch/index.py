"""Batch index build — heap table → inverted-index tables.

Reference analog: ``ambuild`` (pg_search/src/postgres/build.rs, parallel
variant build_parallel.rs) which tokenizes every row into an LSM of
Tantivy segments.  Spark restatement (default path): one declarative job

    docs → analyzer (codegen'd column exprs)
         → doc-local posting aggregation (higher-order functions —
           tf/positions per (doc, term) built inside each row, no
           exchange; the Spark analog of a Tantivy in-memory segment)
         → direct bucket-partitioned parquet write (zero shuffle)

plus two derived stats tables:

    corpus_stats(field, term, df, total_tf) — per-term dictionary
    meta: {field: {num_docs, avg_len}}      — corpus-level BM25 stats

Scale design (100 TB posture):
- The build's only wide exchange is the tiny corpus-stats aggregation;
  the postings themselves never shuffle (``layout="direct"``) — shuffle
  traffic is memory-bandwidth demand, the first resource to saturate as
  executors grow (measured: removing it took N→4N scaling efficiency
  from ~0.70 to 0.83).  File hygiene at scale belongs to the layered
  compactor, like Lucene merge policies.
- ``len_q`` (quantized doc length) is **denormalized into the postings**
  so query-time scoring needs zero extra joins (classic Lucene keeps a
  separate norms file; a join per query is the wrong trade on Spark).
- Persisted postings are hash-bucketed by term (``tb`` partition column)
  so a term lookup prunes to 1/N of the files; corpus_stats is small,
  length-bucketed (fuzzy/prefix pruning), and broadcast at query time.
- Skew (Zipfian tokens like "the") has no surface on the default path:
  postings are built doc-locally and written where they are.  The
  ``shuffle`` strategy's groupBy keys include doc_id (cardinality stays
  ~unique (doc, term) pairs); AQE skew handling covers the rest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import ArrayType

from sparksearch.analysis import analyzer_expr, flat_token_array_expr
from sparksearch.schema import IndexSchema, RECORD_POSITION
from sparksearch.scoring import quantize_len_expr, idf

N_TERM_BUCKETS = 64          # cap; see adaptive_buckets()
DOCS_PER_BUCKET = 100_000    # target volume per bucket partition


MAX_LENGTH_BUCKET = 20


def _length_bucket_py(n: int) -> int:
    return min(int(n), MAX_LENGTH_BUCKET)


def length_bucket_expr(term_col) -> "F.Column":
    """Term-length partition key for the persisted dictionary: one bucket
    per length up to 20 (a billion-term dictionary splits into ~20
    partitions; a fuzzy query at distance d prunes to 2d+1 of them)."""
    return F.least(F.length(term_col), F.lit(MAX_LENGTH_BUCKET))


def adaptive_buckets(n_docs: int) -> int:
    """Bucket count sized to data volume: enough buckets for pruning,
    few enough that per-bucket files stay big (the dynamic-partition
    commit cost is O(tasks × buckets) and dominates small builds; at
    100 TB the cap applies and files are GB-sized)."""
    from sparksearch.config import CONFIG
    return int(min(CONFIG.n_term_buckets, max(8, n_docs // CONFIG.docs_per_bucket)))


import itertools

_OID_SEQ = itertools.count(1)


class SearchIndex:
    """An in-memory handle on the index tables + corpus stats."""

    def __init__(self, spark: SparkSession, schema: IndexSchema, docs: DataFrame,
                 postings: DataFrame, corpus_stats: DataFrame, meta: dict,
                 n_buckets: int = N_TERM_BUCKETS):
        self.spark = spark
        self.schema = schema
        self.docs = docs
        self.postings = postings
        self.corpus_stats = corpus_stats
        self.meta = meta  # {field: {"num_docs": int, "avg_len": float}}
        self.n_buckets = n_buckets
        # set by expand_terms when a dictionary expansion hit its cap
        self.last_expansion_truncated = False
        # creation-order id — the analog of the reference's index OID;
        # when several bm25 indexes coexist over one relation the NEWEST
        # wins (rel_get_bm25_index picks the highest OID,
        # multi_bm25_index.out CREATE INDEX CONCURRENTLY swap workflow)
        self.oid = next(_OID_SEQ)

    # -- stats ------------------------------------------------------------
    def num_docs(self, field: str) -> int:
        return self.meta[field]["num_docs"]

    def avg_len(self, field: str) -> float:
        return self.meta[field]["avg_len"]

    def term_meta(self, field: str, terms: list,
                  bounds: dict | None = None) -> dict:
        """{term: (df, bucket)} for a small set of query terms (driver-side
        collect — bounded by query size, not corpus size).  The bucket id
        is computed JVM-side in the same collect so the compiler can prune
        the postings scan to matching ``tb`` partitions.

        ``bounds``: optional dict filled (in the SAME collect, no extra
        job) with {term: (max_tf, min_len_q)} when the dictionary
        carries the Block-Max columns — absent on indexes saved before
        round 5, in which case it stays empty and callers use the loose
        idf·(k1+1) bound."""
        if not terms:
            return {}
        scan = self.corpus_stats
        if "tl" in scan.columns:
            scan = scan.filter(F.col("tl").isin(
                sorted({_length_bucket_py(len(t)) for t in terms})))
        has_bounds = {"max_tf", "min_len_q"} <= set(scan.columns)
        sel = ["term", "df",
               (F.pmod(F.xxhash64("term"), F.lit(self.n_buckets))
                if self.n_buckets else F.lit(None)).alias("tb")]
        if has_bounds:
            sel += ["max_tf", "min_len_q"]
        rows = (scan
                .filter((F.col("field") == field)
                        & F.col("term").isin(list(set(terms))))
                .select(*sel)
                .collect())
        if bounds is not None and has_bounds:
            bounds.update({r["term"]: (r["max_tf"], r["min_len_q"])
                           for r in rows})
        return {r["term"]: (r["df"], r["tb"]) for r in rows}

    def term_dfs(self, field: str, terms: list) -> dict:
        return {t: df for t, (df, _) in self.term_meta(field, terms).items()}

    @property
    def bucketed(self) -> bool:
        return "tb" in self.postings.columns and self.n_buckets is not None

    def postings_for_terms(self, field: str, terms: list,
                           meta: dict | None = None) -> DataFrame:
        """Bucket-pruned postings scan for an explicit term list: the
        ``tb`` partition filter prunes to |buckets| of the 64 dirs before
        the parquet row-group term filter applies."""
        scan = self.postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(terms)))
        if self.bucketed and terms:
            if meta is None:
                meta = self.term_meta(field, list(terms))
            buckets = sorted({tb for _, tb in meta.values() if tb is not None})
            if buckets:
                scan = scan.filter(F.col("tb").isin(buckets))
        return scan

    def expand_terms(self, field: str, predicate, limit: int = 50,
                     order: str = "df", prefix: str | None = None,
                     length_range: tuple | None = None) -> list:
        """Term-dictionary expansion for fuzzy/regex/prefix queries.

        ``predicate`` is a Column over ``term``; returns [(term, df)].
        ``order='df'`` keeps the highest-df terms under the cap (fuzzy);
        ``order='term'`` truncates in term-dictionary order, matching
        Lucene/Tantivy enumeration for prefix expansion.  ``prefix``
        prunes the dictionary scan to the term's dictionary-order range;
        ``length_range=(lo, hi)`` prunes to the matching term-length
        partitions (``tl`` column, persisted layout) — the automaton-like
        pruning for fuzzy, where only lengths within ±distance can match.
        A truncated expansion is recorded on
        ``self.last_expansion_truncated`` instead of failing silently.
        Reference analog: Tantivy automaton walks over the term dict
        (pg_search/src/query/pdb_query.rs fuzzy/regex nodes).
        """
        scan = self.corpus_stats.filter(F.col("field") == field)
        if prefix:
            # startswith is the truth; the >= bound is a pruning hint the
            # parquet scan can push down.  No upper range bound — Spark
            # compares UTF-8 bytes, where U+FFFF sorts BELOW the
            # supplementary planes, so `term < prefix + '￿'` would
            # drop terms whose char right after the prefix is U+10000+.
            scan = scan.filter((F.col("term") >= prefix)
                               & F.col("term").startswith(prefix))
            if length_range is None:
                length_range = (len(prefix), None)
        if length_range is not None and "tl" in scan.columns:
            lo, hi = length_range
            if lo is not None:
                scan = scan.filter(F.col("tl") >= _length_bucket_py(lo))
            if hi is not None:
                scan = scan.filter(F.col("tl") <= _length_bucket_py(hi))
        key = (F.col("term").asc() if order == "term"
               else F.col("df").desc())
        rows = (scan.filter(predicate)
                .orderBy(key, F.col("term"))
                .limit(limit + 1).collect())
        self.last_expansion_truncated = len(rows) > limit
        if self.last_expansion_truncated:
            import warnings
            warnings.warn(
                f"term expansion on field {field!r} hit the {limit}-term "
                "cap; results are computed over the kept expansions "
                f"(order={order!r})", stacklevel=2)
        rows = rows[:limit]
        return [(r["term"], r["df"]) for r in rows]

    def idf(self, field: str, doc_freq: int) -> float:
        return idf(self.num_docs(field), doc_freq)

    def total_docs(self) -> int:
        """Total docs in the index (the N of every field's BM25 stats —
        partial-index aware, since meta is computed over the indexed
        corpus)."""
        if self.meta:
            return next(iter(self.meta.values()))["num_docs"]
        return self.docs.count()

    def attr_df(self, field: str, value) -> int:
        """Doc frequency of one exact value of an indexed non-text
        (numeric/boolean) field.  Tantivy reads this from the term
        dictionary; on Spark the column IS the index, so the lookup is
        one column-pruned, predicate-pushdown parquet count — bounded by
        query size (one count per equality leaf), never collected rows."""
        src = self.schema.attr_source(field)
        c = F.expr(src) if src is not None else F.col(field)
        return self.docs.filter(c == F.lit(value)).count()

    # -- persistence ("segments") ----------------------------------------
    def save(self, path: str) -> None:
        nb = adaptive_buckets(next(iter(self.meta.values()))["num_docs"]
                              if self.meta else 0)
        p = self.postings.withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(nb)))
        (bucketed_repartition(p, nb)
         .write.mode("overwrite").partitionBy("field", "tb").parquet(f"{path}/postings"))
        (self.corpus_stats
         .withColumn("tl", length_bucket_expr(F.col("term")))
         .repartition("field", "tl").sortWithinPartitions("term")
         .write.mode("overwrite").partitionBy("field", "tl")
         .parquet(f"{path}/corpus_stats"))
        self.docs.write.mode("overwrite").parquet(f"{path}/docs")
        with open(f"{path}/meta.json", "w") as fh:
            json.dump({"meta": self.meta, "key_field": self.schema.key_field,
                       "n_buckets": nb,
                       "fields": [f.name for f in self.schema.text_fields]}, fh)

    @staticmethod
    def load(spark: SparkSession, path: str, schema: IndexSchema) -> "SearchIndex":
        with open(f"{path}/meta.json") as fh:
            blob = json.load(fh)
        return SearchIndex(
            spark, schema,
            docs=spark.read.parquet(f"{path}/docs"),
            postings=spark.read.parquet(f"{path}/postings"),
            corpus_stats=spark.read.parquet(f"{path}/corpus_stats"),
            meta=blob["meta"],
            n_buckets=blob.get("n_buckets", N_TERM_BUCKETS))


def field_text_col(docs: DataFrame, cfg) -> Column:
    """The analyzable text column for a field.  Plain string columns pass
    through; ``array<string>`` columns (reference TEXT[] fields, e.g.
    pg_regress snippet_position_01_basic's ``titles TEXT[]``) are
    space-joined so elements tokenize in document order with contiguous
    positions, and snippet char offsets index into the joined string —
    matching the reference's rendered form (``{{0,4},{5,12}}`` over
    ``'test snippet function'``)."""
    src = cfg.source or cfg.name
    if src not in docs.columns:
        # indexed EXPRESSION source (reference: CREATE INDEX ... USING
        # bm25 (id, (lower(description)::pdb.literal)),
        # aliased_text_expression_topk_orderby.out) — any Spark SQL
        # expression over the doc row
        return F.expr(src)
    if isinstance(docs.schema[src].dataType, ArrayType):
        # word tokenizers: a space join is token-identical to per-element
        # tokenization.  char-ngram tokenizers gram RAW chars (spaces
        # included), so a space join would fabricate grams spanning two
        # elements (Tantivy grams each array value separately,
        # ngram-text-array.out) — join with \x00, which the ngram
        # tokenizers treat as a segment boundary.  Keyword-family
        # tokenizers emit ONE term per array ELEMENT in the reference
        # ('dog' = ANY(description) over description::pdb.literal pushes
        # down to term value "dog", pushdown_array_field.out) — \x00-join
        # and the keyword tokenizers split back on the boundary.
        sep = (" " if cfg.tokenizer not in
               ("ngram", "edge_ngram", "keyword", "raw", "literal",
                "literal_normalized") else "\x00")
        return F.concat_ws(sep, F.col(src))
    return F.col(src)


def _exploded_tokens(docs: DataFrame, schema: IndexSchema) -> DataFrame:
    """docs → (doc_id, field, len_q, t, p), one row per token occurrence.

    Uses the flat posexplode fast path (pure codegen, no struct stream)
    when the field's analyzer preserves ordinal positions."""
    parts = []
    for cfg in schema.text_fields:
        flat = flat_token_array_expr(field_text_col(docs, cfg), cfg)
        if flat is not None:
            base = docs.select(
                F.col(schema.key_field).alias("doc_id"),
                F.lit(cfg.name).alias("field"),
                flat.alias("arr"))
            base = base.withColumn("len_q", quantize_len_expr(F.size("arr")))
            part = base.select(
                "doc_id", "field", "len_q",
                F.posexplode("arr").alias("p", "t"))
        else:
            base = docs.select(
                F.col(schema.key_field).alias("doc_id"),
                F.lit(cfg.name).alias("field"),
                analyzer_expr(field_text_col(docs, cfg), cfg).alias("toks"))
            base = base.withColumn("len_q", quantize_len_expr(F.size("toks")))
            part = base.select(
                "doc_id", "field", "len_q",
                F.explode("toks").alias("tk"),
            ).select("doc_id", "field", "len_q",
                     F.col("tk.p").alias("p"), F.col("tk.t").alias("t"))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def postings_df(docs: DataFrame, schema: IndexSchema,
                strategy: str = "local") -> DataFrame:
    """The postings plan.

    ``strategy="local"`` (default) builds each document's posting entries
    doc-locally with higher-order functions — ZERO shuffle; this is the
    Spark analog of Tantivy building a segment in memory before flushing
    (index/writer/index.rs:347-399).  The only downstream shuffles are the
    optional bucketed-layout repartition and the tiny corpus-stats agg.
    O(unique_terms × tokens) per doc — ideal for turn/paragraph-sized docs.

    ``strategy="arrow"`` builds postings doc-locally in vectorized python
    workers (mapInPandas): tokenize + dict-accumulate per doc, Arrow-batch
    the posting rows back.  Python workers are share-nothing processes, so
    this path scales linearly with cores where the interpreted
    higher-order-function path bottlenecks on JVM allocation/GC; it also
    supports every tokenizer + filter chain (py_analyze).  O(tokens) per
    doc — use it for long documents too.

    ``strategy="shuffle"`` explodes tokens and groupBys (field, term,
    doc_id) — fully codegen'd, no python; kept for plans that must stay
    JVM-only.
    """
    if strategy == "arrow":
        return _postings_arrow(docs, schema)
    if strategy == "shuffle":
        exploded = _exploded_tokens(docs, schema)
        postings = (exploded
                    .groupBy("field", F.col("t").alias("term"), "doc_id")
                    .agg(F.count("*").cast("int").alias("tf"),
                         F.sort_array(F.collect_list(F.col("p"))).alias("positions"),
                         F.first("len_q").alias("len_q")))
    else:
        parts = []
        for cfg in schema.text_fields:
            flat = flat_token_array_expr(field_text_col(docs, cfg), cfg)
            if flat is not None:
                base = docs.select(F.col(schema.key_field).alias("doc_id"),
                                   F.lit(cfg.name).alias("field"),
                                   flat.alias("arr"))
                zipped = F.transform(
                    F.col("arr"),
                    lambda x, i: F.struct(x.alias("t"), i.cast("int").alias("p")))
                base = base.withColumn("zipped", zipped)
            else:
                base = docs.select(F.col(schema.key_field).alias("doc_id"),
                                   F.lit(cfg.name).alias("field"),
                                   analyzer_expr(field_text_col(docs, cfg), cfg).alias("zipped"))
                base = base.withColumn(
                    "arr", F.transform(F.col("zipped"), lambda s: s["t"]))
            base = base.withColumn("len_q", quantize_len_expr(F.size("zipped")))
            entries = F.transform(
                F.array_distinct(F.col("arr")),
                lambda u: F.struct(
                    u.alias("term"),
                    F.filter(F.col("zipped"), lambda s: s["t"] == u).alias("occ")))
            part = (base.select("doc_id", "field", "len_q",
                                F.explode(entries).alias("e"))
                    .select("field", F.col("e.term").alias("term"), "doc_id",
                            F.size("e.occ").alias("tf"),
                            F.transform("e.occ", lambda s: s["p"]).alias("positions"),
                            "len_q"))
            parts.append(part)
        if not parts:
            # an index with no text fields (reference: pure fast-field
            # bm25 indexes, e.g. agg-max-pushdown.out `bm25 (id, d)`) —
            # empty postings, docs themselves are the columnar index
            postings = docs.sparkSession.createDataFrame(
                [], _postings_schema_str(docs, schema.key_field))
        else:
            postings = parts[0]
        for p in parts[1:]:
            postings = postings.unionByName(p)

    # drop positions for fields that asked for record != position
    pos_fields = [f.name for f in schema.text_fields if f.record == RECORD_POSITION]
    if set(pos_fields) != set(schema.field_names):
        postings = postings.withColumn(
            "positions",
            F.when(F.col("field").isin(pos_fields), F.col("positions")))
    return postings


def _postings_schema_str(docs: DataFrame, key: str) -> str:
    key_t = docs.schema[key].dataType.simpleString()
    return (f"field string, term string, doc_id {key_t}, tf int, "
            "positions array<int>, len_q int")


def _postings_arrow(docs: DataFrame, schema: IndexSchema) -> DataFrame:
    """Doc-local posting build in python workers (Arrow both ways).

    The tokenizer/filters run through py_analyze, the exact python twin of
    the JVM analyzer (tested equal in tests/test_analysis.py), so postings
    are bit-identical across strategies.
    """
    import pandas as pd
    from sparksearch.analysis import py_analyze
    from sparksearch.scoring import quantize_len
    from sparksearch.schema import RECORD_POSITION as _RP

    cfgs = [(c.name, f"__txt_{c.name}", c, c.record == _RP)
            for c in schema.text_fields]
    key = schema.key_field

    def gen(batches):
        for pdf in batches:
            cols = {"field": [], "term": [], "doc_id": [], "tf": [],
                    "positions": [], "len_q": []}
            for fname, src_col, cfg, keep_pos in cfgs:
                texts = pdf[src_col].values
                keys = pdf[key].values
                for doc_id, text in zip(keys, texts):
                    toks = py_analyze(text, cfg)
                    d: dict = {}
                    for t, p in toks:
                        d.setdefault(t, []).append(p)
                    lq = quantize_len(len(toks))
                    for t, ps in d.items():
                        cols["field"].append(fname)
                        cols["term"].append(t)
                        cols["doc_id"].append(doc_id)
                        cols["tf"].append(len(ps))
                        cols["positions"].append(ps if keep_pos else None)
                        cols["len_q"].append(lq)
            yield pd.DataFrame(cols)

    # One rendered column PER FIELD, not per source: array<string>
    # columns join with a tokenizer-dependent separator (\x00 segments
    # for ngram tokenizers vs space for word tokenizers), so two fields
    # sharing one source can need different renderings of it.
    sel = [F.col(key)] + [
        field_text_col(docs, c).alias(f"__txt_{c.name}")
        for c in schema.text_fields]
    return (docs.select(*sel)
            .mapInPandas(gen, schema=_postings_schema_str(docs, key)))


def _meta_from_postings(postings: DataFrame, n_total: int) -> dict:
    # total tokens per field == Σ tf; avg_len == Σ tf / N — no second
    # tokenize pass needed.
    rows = postings.groupBy("field").agg(F.sum("tf").alias("total")).collect()
    return {r["field"]: {"num_docs": n_total,
                         "avg_len": (r["total"] or 0) / max(n_total, 1)}
            for r in rows}


def corpus_stats_df(postings: DataFrame) -> DataFrame:
    """(field, term, df, total_tf, max_tf, min_len_q) — df for idf,
    total_tf for corpus-level BM25 meta, and the per-term BOUNDS
    (max observed tf, min observed quantized length) that give the
    MaxScore prune its tight score upper bound — the term-level
    Block-Max metadata (compile_query_topk), riding the existing
    dictionary groupBy for free."""
    return (postings.groupBy("field", "term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"),
                 F.max("tf").alias("max_tf"),
                 F.min("len_q").alias("min_len_q")))


def _apply_predicate(docs: DataFrame, schema: IndexSchema) -> DataFrame:
    """Partial-index restriction (reference ``CREATE INDEX ... WHERE``):
    only predicate-matching rows are indexed, so BM25 stats and results
    all reflect the partial corpus (partial_index_gating.out)."""
    if schema.predicate:
        return docs.filter(F.expr(schema.predicate))
    return docs


def build_index(docs: DataFrame, schema: IndexSchema,
                cache: bool = True, strategy: str = "local") -> SearchIndex:
    """Build the inverted index in memory (reference: ambuild / build.rs)."""
    schema.validate(docs.schema)  # index_config_errors.out messages
    schema.partition_fields(docs.schema)  # validate (partition_by.out)
    docs = _apply_predicate(docs, schema)
    spark = docs.sparkSession
    postings = postings_df(docs, schema, strategy)
    if cache:
        postings = postings.cache()
    corpus_stats = corpus_stats_df(postings)
    if cache:
        corpus_stats = corpus_stats.cache()
    n_total = docs.count()
    rows = corpus_stats.groupBy("field").agg(F.sum("total_tf").alias("t")).collect()
    meta = {r["field"]: {"num_docs": n_total,
                         "avg_len": (r["t"] or 0) / max(n_total, 1)}
            for r in rows}
    return SearchIndex(spark, schema, docs, postings, corpus_stats, meta)


def bucketed_repartition(p: DataFrame, nb: int,
                         parallelism: int | None = None) -> DataFrame:
    """Repartition postings for the bucketed write.  A bare
    repartition("field", "tb") caps the write stage at nb tasks — fewer
    than the cores at any real parallelism — so buckets are split across
    ~2×cores writer tasks with a doc-keyed salt.  Files per bucket dir =
    salt fan-out (bounded, still big files at scale); readers are
    unaffected (the ``tb`` dir is the pruning unit, not the file)."""
    if parallelism is None:
        parallelism = p.sparkSession.sparkContext.defaultParallelism
    # 4× cores: several task waves in the write stage, so one straggling
    # task (GC pause, noisy neighbor) costs a fraction of a wave, not a
    # whole stage — single-wave fat tasks are the scaling tail.  Explicit
    # numPartitions (not spark.sql.shuffle.partitions) so the write grain
    # is independent of the query-side shuffle setting.
    target = parallelism * 4
    salt_k = max(1, -(-target // max(nb, 1)))
    if salt_k > 1:
        return (p.withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_k)))
                .repartition(target, F.col("field"), F.col("tb"), F.col("_salt"))
                .drop("_salt"))
    return p.repartition(target, F.col("field"), F.col("tb"))


def build_and_save(docs: DataFrame, schema: IndexSchema, path: str,
                   save_docs: bool = False,
                   strategy: str = "local",
                   layout: str = "direct",
                   segmented: bool = False) -> SearchIndex:
    """Scale path: ONE tokenize pass, TWO Spark jobs total.

    Job 1 tokenizes and writes the term-bucketed postings; the per-field
    token totals that BM25 meta needs ride along as an ``observe()``
    metric on the same pass (no separate stats job, no re-tokenize).
    Job 2 derives corpus_stats from the written postings (columnar scan
    of term/tf only).  The upfront ``docs.count()`` is metadata-only on
    parquet sources (footer row counts) — effectively free.

    ``layout="direct"`` (default) writes the bucketed dirs straight from
    the tokenize stage — zero shuffle, the Lucene/Tantivy writer model
    (each writer flushes its own segment; index/writer/index.rs:347-399).
    The postings shuffle was the build's scaling killer: it pushes the
    full postings volume (positions arrays included) through shuffle
    write+fetch, doubling memory-bandwidth demand — the resource that
    saturates first as cores grow.  Cost: files per bucket dir = number
    of writer tasks that saw that bucket (bounded by ``coalesce(4×
    cores)``); at cluster scale the layered compactor
    (streaming/indexer.py) is the file-hygiene mechanism, exactly like
    Lucene merge policies.  ``layout="salted"`` keeps the shuffled
    doc-salted writer (fewest, largest files per bucket) for one-shot
    bulk loads where no compactor will ever run.

    ``segmented=True`` is the reference's ambuild-then-aminsert flow
    (CREATE INDEX then INSERT; pg_search index/writer): the bulk build
    lands as the BASE SEGMENT (``segments/epoch=b0``) of a segmented
    index, so :func:`streaming.indexer.insert_docs` appends and
    :func:`streaming.indexer.open_segmented_index` reads the union —
    same zero-shuffle direct layout, plus the per-segment stats.json the
    segmented reader merges."""
    from pyspark.sql import Observation
    schema.validate(docs.schema)  # index_config_errors.out messages
    docs = _apply_predicate(docs, schema)
    spark = docs.sparkSession
    n_total = docs.count()
    nb = adaptive_buckets(n_total)
    fields = schema.field_names
    root = f"{path}/segments/epoch=b0" if segmented else path
    obs = Observation()
    p = (postings_df(docs, schema, strategy)
         .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(nb)))
         .observe(obs, *[F.sum(F.when(F.col("field") == f_, F.col("tf")))
                         .alias(f"t_{i}") for i, f_ in enumerate(fields)]))
    if layout == "salted":
        w = bucketed_repartition(p, nb)
    else:
        w = p.coalesce(spark.sparkContext.defaultParallelism * 4)
    (w.write.mode("overwrite").partitionBy("field", "tb")
     .parquet(f"{root}/postings"))
    totals = obs.get
    postings = spark.read.parquet(f"{root}/postings")
    if segmented:
        from sparksearch.streaming.indexer import (_atomic_success,
                                                   segment_content_hash)
        with open(f"{root}/stats.json", "w") as fh:
            json.dump({"n_docs": n_total, "epoch": "b0", "n_buckets": nb,
                       "content_hash": segment_content_hash(postings),
                       "fields": {f_: {"total_len": int(totals[f"t_{i}"] or 0)}
                                  for i, f_ in enumerate(fields)}}, fh)
        _atomic_success(root)
    # dictionary layout: partitioned by (field, term-length bucket) and
    # term-sorted within partitions — fuzzy prunes to ±distance length
    # partitions, prefix/regex-with-literal-head prune via row-group
    # min/max stats on the sorted term column
    (corpus_stats_df(postings)
     .withColumn("tl", length_bucket_expr(F.col("term")))
     .repartition("field", "tl").sortWithinPartitions("term")
     .write.mode("overwrite").partitionBy("field", "tl")
     .parquet(f"{path}/corpus_stats"))
    corpus_stats = spark.read.parquet(f"{path}/corpus_stats")
    meta = {f_: {"num_docs": n_total,
                 "avg_len": (totals[f"t_{i}"] or 0) / max(n_total, 1)}
            for i, f_ in enumerate(fields)}
    if save_docs:
        out = docs
        part_cols = schema.partition_fields(docs.schema)
        sb = (schema.sort_by or "").strip().lower()
        sort_expr = None
        if sb and sb != "none":
            # reference sort_by segment pre-sorting (sort_by.out):
            # range-partition + in-partition sort so every parquet
            # row-group covers a disjoint key range — ORDER BY/keyset
            # scans prune on row-group min/max stats
            parts = sb.split()
            col = F.col(parts[0])
            desc = len(parts) > 1 and parts[1] == "desc"
            if "first" in parts:
                sort_expr = (col.desc_nulls_first() if desc
                             else col.asc_nulls_first())
            elif desc:
                sort_expr = col.desc_nulls_first()
            else:
                sort_expr = col.asc_nulls_last()
            if not part_cols:
                out = (docs.repartitionByRange(
                    max(docs.sparkSession.sparkContext.defaultParallelism, 1),
                    sort_expr).sortWithinPartitions(sort_expr))
        w = out.write.mode("overwrite")
        if part_cols:
            # reference partition_by WITH option (partition_by.out):
            # segments split physically by these field values — the
            # Spark analog is hive-style parquet partitioning, so any
            # attribute filter on a partition column prunes whole
            # directories (the reference's segment skip).  When sort_by
            # is ALSO set the two compose: repartition by the partition
            # columns, then sort within each partition so every
            # directory's row groups keep the promised sorted-segment
            # property (min/max pruning inside each partition).
            out = out.repartition(*[F.col(c) for c in part_cols])
            if sort_expr is not None:
                out = out.sortWithinPartitions(sort_expr)
            w = out.write.mode("overwrite").partitionBy(*part_cols)
        w.parquet(f"{path}/docs")
    with open(f"{path}/meta.json", "w") as fh:
        json.dump({"meta": meta, "key_field": schema.key_field,
                   "n_buckets": nb,
                   "fields": [f.name for f in schema.text_fields]}, fh)
    return SearchIndex(spark, schema, docs, postings, corpus_stats, meta,
                       n_buckets=nb)


def load_or_build(spark: SparkSession, docs: DataFrame, schema: IndexSchema,
                  path: str | None = None) -> SearchIndex:
    if path and os.path.exists(f"{path}/meta.json"):
        return SearchIndex.load(spark, path, schema)
    idx = build_index(docs, schema)
    if path:
        idx.save(path)
        return SearchIndex.load(spark, path, schema)
    return idx
