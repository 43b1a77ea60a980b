"""term_set_dispatch.out / term_set_equivalence.out parity.

The reference picks a per-scan TermSet execution strategy (bitset /
linear / gallop) from K/N density and dictionary shape, and its two
goldens pin (a) the dispatch decisions and (b) that EVERY strategy
returns the identical row set.  On Spark the strategy choice belongs to
Catalyst/AQE (broadcast-IN vs shuffled semi-join), so the dispatch
tokens are N/A — but the user-facing contract is portable: a build-side
IN-list pushed into the inner scan returns exactly the hash-join row
set on every corpus shape the goldens exercise (D=1 unique, D=100
multi, sorted segments) at every K the goldens probe (4, 5, 6, 50, 60,
100 — the threshold-straddling densities).
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

N = 10_000


@pytest.fixture(scope="module")
def corpora(spark):
    # ts_unique: fk = id (D=1); ts_multi: fk = ((i-1) % 100) + 1 (D=100);
    # ts_sorted: unique fks written pre-sorted (gallop-shaped segments)
    base = spark.range(1, N + 1).select(
        F.col("id").cast("int").alias("id"), F.lit("doc").alias("val"))
    uniq = base.withColumn("fk", F.col("id"))
    multi = base.withColumn("fk", ((F.col("id") - 1) % 100 + 1).cast("int"))
    srt = uniq.orderBy("fk")
    out = {}
    for name, df in (("unique", uniq), ("multi", multi), ("sorted", srt)):
        schema = IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="val")],
            sort_by="fk asc" if name == "sorted" else None)
        out[name] = (df, build_index(df, schema))
    return out


def _termset_rows(idx, ks):
    """The inner scan under a pushed TermSet of size K — the engine's
    build-side IN-list (contract join_topk pattern)."""
    q = ast.Boolean(must=[ast.TermSet("fk", ks),
                          ast.Term("val", "doc")])
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


def _hash_join_rows(df, spark, k):
    """The reference's hash-join twin: ts_outer (200 rows) filtered to
    id <= K, joined on fk."""
    outer = spark.range(1, 201).select(F.col("id").cast("int").alias("oid"))
    return sorted(r["id"] for r in
                  df.join(outer.filter(F.col("oid") <= k),
                          df["fk"] == F.col("oid")).select("id").collect())


# the goldens' K probes: 4/5/6 straddle the unique bitset gate
# (K/N = 0.0005), 50/60 straddle the multi gate (0.005), 100 is the
# gallop-at-any-density case
@pytest.mark.parametrize("shape,k", [
    ("unique", 4), ("unique", 5), ("unique", 6),
    ("multi", 50), ("multi", 60),
    ("sorted", 100),
])
def test_termset_rowset_equals_hash_join(spark, corpora, shape, k):
    df, idx = corpora[shape]
    ks = list(range(1, k + 1))
    got = _termset_rows(idx, ks)
    want = _hash_join_rows(df, spark, k)
    assert got == want
    # sanity: expected cardinality — D=1 gives K rows, D=100 gives
    # K * (N/100) rows
    if shape == "multi":
        assert len(got) == k * (N // 100)
    else:
        assert len(got) == k


def test_termset_empty_and_full(corpora):
    """Dispatch edge strategies 'empty' and 'true': an empty TermSet
    matches nothing; a TermSet covering every fk value matches all."""
    _, idx = corpora["unique"]
    assert _termset_rows(idx, []) == []
    _, midx = corpora["multi"]
    assert len(_termset_rows(midx, list(range(1, 101)))) == N
