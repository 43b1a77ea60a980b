"""sparksearch — a from-scratch PySpark-native BM25 search-indexing engine.

Re-creates the query and data-processing capabilities of ParadeDB's
``pg_search`` (reference: /root/reference, v0.25.2) as an idiomatic Spark
stack: DataFrame/SQL plans compiled by Catalyst, Arrow/pandas UDFs for text
analysis, Structured Streaming for continuous indexing, and parquet
("segment") tables for the inverted index.

Public surface:

- :mod:`sparksearch.analysis` — tokenizers + token-filter chains
  (reference: tokenizers/src/manager.rs).
- :mod:`sparksearch.schema` — IndexSchema / per-field config
  (reference: pg_search/src/schema/mod.rs, config.rs).
- :mod:`sparksearch.index` — batch index build: postings / doc-stats /
  corpus-stats DataFrames (reference: pg_search/src/postgres/build.rs).
- :mod:`sparksearch.scoring` — Tantivy/Lucene BM25 with 1-byte fieldnorm
  quantization (reference: tantivy bm25 + fieldnorm/code.rs semantics).
- :mod:`sparksearch.query` — query AST, mini query-string parser and the
  AST → DataFrame compiler (reference: pg_search/src/query/*).
- :mod:`sparksearch.aggs` — ES-compatible JSON aggregation DSL compiler
  (reference: pg_search/src/api/aggregate.rs, aggregatescan/*).
- :mod:`sparksearch.streaming` — continuous indexing: watermarked session
  windows, stateful posting maintenance, idempotent sink, checkpoint
  resume (north-rule streaming tier).
- :mod:`sparksearch.pipeline` — large-scale training-data ops: dedup,
  similarity search, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"

from sparksearch.schema import FieldConfig, IndexSchema  # noqa: F401
from sparksearch.index import SearchIndex, build_index  # noqa: F401
