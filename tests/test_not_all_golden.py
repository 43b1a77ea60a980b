"""not-paradedb_all.out golden (PUBLIC reference behavior, mock_items
corpus): negating pdb.all() — `id @@@ paradedb.all()` returns every row,
`NOT id @@@ paradedb.all()` returns none, and an OR-of-join-predicates
whose right arm is all() degenerates to the full cross product
(41 × 41 = 1681 pairs; the reference falls back from JoinScan with a
"at least one equi-join key is required" warning and evaluates the OR
row-by-row).

Ref: pg_search/tests/pg_regress/expected/not-paradedb_all.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def notpdball(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description"),
                                     FieldConfig(name="category")]))
    return docs, idx


def test_all_matches_every_row(notpdball):
    docs, idx = notpdball
    m = compile_query(idx, ast.All()).select("doc_id")
    got = docs.join(m, docs["id"] == m["doc_id"], "left_semi") \
        .select("id").orderBy("id").collect()
    assert [r["id"] for r in got] == list(range(1, 42))


def test_not_all_matches_nothing(notpdball):
    docs, idx = notpdball
    m = compile_query(idx, ast.All()).select("doc_id")
    got = docs.join(m, docs["id"] == m["doc_id"], "left_anti")
    assert got.count() == 0


def test_or_of_all_degenerates_to_cross_product(notpdball):
    """(a.id = b.id AND NOT a@@@all()) OR b@@@all() — the second arm is
    true for every b row, so every (a, b) pair qualifies: 1681 rows
    ordered by (a.id, b.id)."""
    docs, idx = notpdball
    m = compile_query(idx, ast.All()).select("doc_id")
    a = docs.select(F.col("id").alias("aid")) \
        .withColumn("a_all", F.lit(True))  # every a row matches all()
    b = docs.select(F.col("id").alias("bid")) \
        .join(m.withColumnRenamed("doc_id", "bid")
              .withColumn("b_all", F.lit(True)), "bid", "left") \
        .withColumn("b_all", F.coalesce("b_all", F.lit(False)))
    pairs = a.crossJoin(b)
    cond = ((F.col("aid") == F.col("bid")) & ~F.col("a_all")) | \
        F.col("b_all")
    got = pairs.filter(cond).orderBy("aid", "bid")
    assert got.count() == 41 * 41
    first = got.limit(3).collect()
    assert [(r["aid"], r["bid"]) for r in first] == [(1, 1), (1, 2), (1, 3)]
