"""parallel_build_small.out / parallel_build_empty.out parity (PUBLIC
reference behavior, corpus replicated inline): an index built under
EVERY maintenance-parallelism configuration must come out identical —
the reference loops workers × leader_participation × target_segments ×
work_mem and pins the same index_info for all 24 combos, on a 32-row
lorem corpus and on an EMPTY table.  The Spark analog of the config
matrix is build strategy (local / arrow / shuffle) × write layout
(direct / salted) × shuffle width (1 / 32): every combination must
produce the same postings CONTENT (order-independent content hash) and
the same search results; the empty build must yield a valid index that
matches nothing and errors nowhere.

Ref: pg_search/tests/pg_regress/expected/parallel_build_small.out,
     parallel_build_empty.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.index import build_and_save
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.streaming.indexer import segment_content_hash

LOREM = ("lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do "
         "eiusmod tempor incididunt ut labore et dolore magna aliqua. Ut "
         "enim ad minim veniam, quis nostrud exercitation ullamco laboris "
         "nisi ut aliquip ex ea commodo consequat. Duis aute irure dolor "
         "in reprehenderit in voluptate velit esse cillum dolore eu fugiat "
         "nulla pariatur. Excepteur sint occaecat cupidatat non proident, "
         "sunt in culpa qui officia deserunt mollit anim id est laborum.")

SCHEMA = IndexSchema(key_field="id",
                     text_fields=[FieldConfig(name="name")],
                     numeric_fields=["age"])


def _corpus(spark, n=32):
    return spark.range(1, n + 1).select(
        F.col("id").cast("int").alias("id"),
        F.lit(LOREM).alias("name"),
        F.lit(20).cast("int").alias("age"))


def _match_count(idx):
    return compile_query(idx, ast.Term("name", "lorem")).count()


def test_build_matrix_identical_content(spark, tmp_path):
    docs = _corpus(spark)
    hashes, counts = set(), set()
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        combo = 0
        for strategy in ("local", "arrow", "shuffle"):
            for layout in ("direct", "salted"):
                for width in ("1", "32"):
                    spark.conf.set("spark.sql.shuffle.partitions", width)
                    idx = build_and_save(
                        docs, SCHEMA, str(tmp_path / f"b{combo}"),
                        strategy=strategy, layout=layout)
                    # drop positions: the per-(term,doc) posting content
                    # must be identical; physical row order may not be
                    hashes.add(segment_content_hash(idx.postings))
                    counts.add(_match_count(idx))
                    combo += 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(hashes) == 1, f"divergent postings content: {hashes}"
    assert counts == {32}


def test_build_empty_every_strategy(spark):
    empty = _corpus(spark).filter(F.lit(False))
    for strategy in ("local", "arrow", "shuffle"):
        idx = build_index(empty, SCHEMA, strategy=strategy)
        assert _match_count(idx) == 0
        assert idx.postings.count() == 0
