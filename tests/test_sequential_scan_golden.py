"""sequential_scan.out golden (PUBLIC reference behavior, table
replicated inline): a 20k-row corpus under a partial index (WHERE
keep) — full-match count 20000, membership probes at low/mid/high
keys, negation over the full match set (0), and a nonexistent term
(0).  The reference runs this under a 64kB work_mem to force the
match set to spill; Spark's shuffle/aggregate spilling is automatic,
so the pinned semantics are the correctness contract.

Ref: pg_search/tests/pg_regress/expected/sequential_scan.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def seq(spark):
    docs = spark.createDataFrame(
        [(g, f"keyword number {g}", True) for g in range(1, 20001)],
        "id long, body string, keep boolean")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")],
        predicate="keep"))
    return idx, docs


def test_full_match_count(seq):
    idx, _ = seq
    q = ast.Match("body", "keyword")
    assert compile_query(idx, q).count() == 20000


def test_membership_probes(seq):
    idx, docs = seq
    m = compile_query(idx, ast.Match("body", "keyword")).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .filter(F.col("id").isin(1, 10000, 20000))
           .orderBy("id").select("id").collect())
    assert [r[0] for r in got] == [1, 10000, 20000]


def test_negation_over_full_set(seq):
    idx, _ = seq
    q = ast.Boolean(must=[ast.All()],
                    must_not=[ast.Match("body", "keyword")])
    assert compile_query(idx, q).count() == 0


def test_nonexistent_term(seq):
    idx, _ = seq
    assert compile_query(idx,
                         ast.Match("body", "nonexistentterm")).count() == 0
