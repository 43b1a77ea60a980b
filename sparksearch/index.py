"""Batch index build — heap table → inverted-index tables.

Reference analog: ``ambuild`` (pg_search/src/postgres/build.rs, parallel
variant build_parallel.rs) which tokenizes every row into an LSM of
Tantivy segments.  Spark restatement: one declarative job

    docs → analyzer (codegen'd column exprs) → posexplode
         → groupBy(field, term, doc_id) [partial agg map-side]
         → postings(field, term, doc_id, tf, positions, len_q)

plus two derived stats tables:

    corpus_stats(field, term, df)        — document frequency per term
    meta: {field: {num_docs, avg_len}}   — corpus-level BM25 stats

Scale design (100 TB posture):
- Tokenization and tf/position aggregation are entirely JVM-side; the
  only shuffle is the (field, term, doc_id) groupBy, which Spark
  partial-aggregates map-side (ObjectHashAggregate over collect_list).
- ``len_q`` (quantized doc length) is **denormalized into the postings**
  so query-time scoring needs zero extra joins (classic Lucene keeps a
  separate norms file; a join per query is the wrong trade on Spark).
- Persisted postings are hash-bucketed by term (``tb`` partition column)
  so a term lookup prunes to 1/N of the files; corpus_stats is small and
  broadcast at query time.
- Skew (Zipfian tokens like "the") only affects the groupBy — its key
  includes doc_id, so cardinality stays ~unique (doc, term) pairs and no
  single reducer key explodes.  AQE skew handling covers the rest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparksearch.analysis import analyzer_expr
from sparksearch.schema import IndexSchema, RECORD_POSITION
from sparksearch.scoring import quantize_len_expr, idf

N_TERM_BUCKETS = 64


class SearchIndex:
    """An in-memory handle on the index tables + corpus stats."""

    def __init__(self, spark: SparkSession, schema: IndexSchema, docs: DataFrame,
                 postings: DataFrame, corpus_stats: DataFrame, meta: dict):
        self.spark = spark
        self.schema = schema
        self.docs = docs
        self.postings = postings
        self.corpus_stats = corpus_stats
        self.meta = meta  # {field: {"num_docs": int, "avg_len": float}}

    # -- stats ------------------------------------------------------------
    def num_docs(self, field: str) -> int:
        return self.meta[field]["num_docs"]

    def avg_len(self, field: str) -> float:
        return self.meta[field]["avg_len"]

    def term_dfs(self, field: str, terms: list) -> dict:
        """doc-freq for a small set of query terms (driver-side collect —
        bounded by query size, not corpus size)."""
        if not terms:
            return {}
        rows = (self.corpus_stats
                .filter((F.col("field") == field) & F.col("term").isin(list(set(terms))))
                .collect())
        return {r["term"]: r["df"] for r in rows}

    def expand_terms(self, field: str, predicate, limit: int = 50) -> list:
        """Term-dictionary expansion for fuzzy/regex/prefix queries.

        ``predicate`` is a Column over ``term``; returns [(term, df)].
        Reference analog: Tantivy automaton walks over the term dict
        (pg_search/src/query/pdb_query.rs fuzzy/regex nodes).
        """
        rows = (self.corpus_stats
                .filter(F.col("field") == field).filter(predicate)
                .orderBy(F.col("df").desc(), F.col("term"))
                .limit(limit).collect())
        return [(r["term"], r["df"]) for r in rows]

    def idf(self, field: str, doc_freq: int) -> float:
        return idf(self.num_docs(field), doc_freq)

    # -- persistence ("segments") ----------------------------------------
    def save(self, path: str) -> None:
        (self.postings
         .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)))
         .repartition("field", "tb")
         .write.mode("overwrite").partitionBy("field", "tb").parquet(f"{path}/postings"))
        self.corpus_stats.write.mode("overwrite").partitionBy("field") \
            .parquet(f"{path}/corpus_stats")
        self.docs.write.mode("overwrite").parquet(f"{path}/docs")
        with open(f"{path}/meta.json", "w") as fh:
            json.dump({"meta": self.meta, "key_field": self.schema.key_field,
                       "fields": [f.name for f in self.schema.text_fields]}, fh)

    @staticmethod
    def load(spark: SparkSession, path: str, schema: IndexSchema) -> "SearchIndex":
        with open(f"{path}/meta.json") as fh:
            meta = json.load(fh)["meta"]
        return SearchIndex(
            spark, schema,
            docs=spark.read.parquet(f"{path}/docs"),
            postings=spark.read.parquet(f"{path}/postings").drop("tb"),
            corpus_stats=spark.read.parquet(f"{path}/corpus_stats"),
            meta=meta)


def tokenstream_df(docs: DataFrame, schema: IndexSchema) -> DataFrame:
    """docs → (doc_id, field, toks array<struct<t,p>>, len, len_q), one row
    per (doc, indexed field)."""
    parts = []
    for cfg in schema.text_fields:
        part = docs.select(
            F.col(schema.key_field).alias("doc_id"),
            F.lit(cfg.name).alias("field"),
            analyzer_expr(F.col(cfg.name), cfg).alias("toks"),
        ).withColumn("len", F.size("toks")) \
         .withColumn("len_q", quantize_len_expr(F.col("len")))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_index(docs: DataFrame, schema: IndexSchema,
                cache: bool = True) -> SearchIndex:
    """Build the inverted index (reference: ambuild / build.rs)."""
    spark = docs.sparkSession
    stream = tokenstream_df(docs, schema)

    exploded = stream.select(
        "doc_id", "field", "len", "len_q",
        F.explode("toks").alias("tk"),
    )
    postings = (exploded
                .groupBy("field", F.col("tk.t").alias("term"), "doc_id")
                .agg(F.count("*").alias("tf"),
                     F.sort_array(F.collect_list(F.col("tk.p"))).alias("positions"),
                     F.first("len_q").alias("len_q")))

    # drop positions for fields that asked for record != position
    pos_fields = [f.name for f in schema.text_fields if f.record == RECORD_POSITION]
    if set(pos_fields) != set(schema.field_names):
        postings = postings.withColumn(
            "positions",
            F.when(F.col("field").isin(pos_fields), F.col("positions")))

    if cache:
        postings = postings.cache()

    corpus_stats = (postings.groupBy("field", "term")
                    .agg(F.count("*").alias("df")))
    if cache:
        corpus_stats = corpus_stats.cache()

    n_total = docs.count()
    stats_rows = (stream.groupBy("field")
                  .agg(F.sum("len").alias("total_len")).collect())
    meta = {r["field"]: {"num_docs": n_total,
                         "avg_len": (r["total_len"] or 0) / max(n_total, 1)}
            for r in stats_rows}
    return SearchIndex(spark, schema, docs, postings, corpus_stats, meta)


def load_or_build(spark: SparkSession, docs: DataFrame, schema: IndexSchema,
                  path: str | None = None) -> SearchIndex:
    if path and os.path.exists(f"{path}/meta.json"):
        return SearchIndex.load(spark, path, schema)
    idx = build_index(docs, schema)
    if path:
        idx.save(path)
        return SearchIndex.load(spark, path, schema)
    return idx
