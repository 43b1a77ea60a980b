"""aggregate_datafusion_routing.out golden (PUBLIC reference behavior,
table replicated inline): the bucket-cap GUC governs which aggregate
BACKEND runs, never the RESULT.  When the estimated group count
exceeds ``paradedb.max_term_agg_buckets`` the reference routes the
GROUP BY to its unbounded backend and still returns every group with
exact counts; a bounded LIMIT within the cap stays on the capped
fast path and each returned group carries its exact count; a selective
filter that leaves few possible groups stays on the fast path too.

Spark restatement: plain SQL GROUP BY compiles to native (unbounded)
hash aggregation — the cap GUC applies only to the ES-envelope
aggregate surface, exactly like the reference's Tantivy path — so the
result-identity contract is: a low cap NEVER truncates or distorts a
SQL GROUP BY, and the envelope path under the cap returns exact
per-bucket counts.

Ref: pg_search/tests/pg_regress/expected/aggregate_datafusion_routing.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch import config as sscfg
from sparksearch.aggs import search_aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

N = 100_000


@pytest.fixture(scope="module")
def routing(spark):
    docs = spark.range(1, N + 1).select(
        F.col("id").cast("long").alias("id"),
        F.format_string("cat_%02d", F.col("id") % 50).alias("cat"),
        F.format_string("sub_%d", F.col("id") % 2).alias("sub"))
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="cat", tokenizer="literal",
                                 lowercase=False, fast=True),
                     FieldConfig(name="sub", tokenizer="literal",
                                 lowercase=False, fast=True)]))
    idx.table_name = "routing_test"
    return docs, idx


@pytest.fixture()
def low_cap():
    old = sscfg.get().max_agg_buckets
    sscfg.set(max_agg_buckets=10)
    yield
    sscfg.set(max_agg_buckets=old)


def _matched(routing, q=None):
    docs, idx = routing
    m = compile_query(idx, q or ast.All()).select(
        F.col("doc_id").alias("k"))
    return docs.join(m, docs.id == F.col("k"))


def test_unbounded_groupby_returns_all_groups(routing, low_cap):
    """50 groups > cap 10: the SQL GROUP BY routes to the unbounded
    backend — all 50 groups come back, none truncated."""
    got = _matched(routing).groupBy("cat").count()
    assert got.count() == 50


def test_bounded_limit_groups_carry_exact_counts(routing, low_cap):
    """LIMIT 5 within the cap: every returned group's count is the
    exact 2000, never approximate or cap-truncated."""
    got = (_matched(routing).groupBy("cat")
           .agg(F.count("*").alias("cnt"))
           .orderBy("cat").limit(5).collect())
    assert len(got) == 5
    assert {r.cnt for r in got} == {2000}
    assert [r.cat for r in got] == [f"cat_{i:02d}" for i in range(5)]


def test_limit_offset_beyond_cap_still_exact(routing, low_cap):
    """LIMIT 8 OFFSET 5 (fetch 13 > cap 10): unbounded backend; rows
    exact."""
    got = (_matched(routing).groupBy("cat")
           .agg(F.count("*").alias("cnt"))
           .orderBy("cat").offset(5).limit(8).collect())
    assert [r.cat for r in got] == [f"cat_{i:02d}" for i in range(5, 13)]
    assert {r.cnt for r in got} == {2000}


def test_multi_column_groupby_exact(routing, low_cap):
    """Multiple grouping columns (50 combos > cap; sub is functionally
    determined by cat since 50 is even — same property as the
    reference corpus): unbounded backend, exact 2000 counts."""
    got = (_matched(routing).groupBy("cat", "sub")
           .agg(F.count("*").alias("cnt"))
           .orderBy("cat", "sub").limit(5).collect())
    assert [(r.cat, r.sub, r.cnt) for r in got] == [
        ("cat_00", "sub_0", 2000), ("cat_01", "sub_1", 2000),
        ("cat_02", "sub_0", 2000), ("cat_03", "sub_1", 2000),
        ("cat_04", "sub_0", 2000)]


def test_selective_filter_stays_under_cap(routing, low_cap):
    """id @@@ '7' matches one row → 1 possible group, under the cap:
    the fast (envelope) path serves it with the exact count."""
    docs, idx = routing
    env = search_aggregate(idx, ast.Parse("7", field="id"),
                           {"cats": {"terms": {"field": "cat"}}})
    buckets = env["aggregations"]["cats"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == [
        ("cat_07", 1)]


def test_low_cardinality_envelope_under_cap(routing, low_cap):
    """2 sub groups < cap 10: the envelope path returns both with
    exact 50k counts."""
    docs, idx = routing
    env = search_aggregate(idx, ast.All(),
                           {"subs": {"terms": {"field": "sub"}}})
    got = {(b["key"], b["doc_count"])
           for b in env["aggregations"]["subs"]["buckets"]}
    assert got == {("sub_0", 50_000), ("sub_1", 50_000)}


def test_envelope_over_cap_aborts_not_truncates(routing, low_cap):
    """The envelope (Tantivy-path) surface NEVER silently truncates:
    the ES default size=10 page is EXPLICIT truncation
    (sum_other_doc_count accounts for the other 40 groups), and asking
    for more buckets than the cap aborts with the guardrail error."""
    docs, idx = routing
    env = search_aggregate(idx, ast.All(),
                           {"cats": {"terms": {"field": "cat"}}})
    cats = env["aggregations"]["cats"]
    assert len(cats["buckets"]) == 10
    assert all(b["doc_count"] == 2000 for b in cats["buckets"])
    assert cats["sum_other_doc_count"] == 80_000
    with pytest.raises(Exception, match="max_agg_buckets"):
        search_aggregate(idx, ast.All(),
                         {"cats": {"terms": {"field": "cat",
                                             "size": 50}}})
