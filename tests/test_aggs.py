"""JSON aggregation DSL tests (reference: api/aggregate.rs ES-compatible
surface; docs/documentation/aggregates/*)."""

import pytest
from pyspark.sql import functions as F

from sparksearch.aggs import run_aggs, search_aggregate, AggError
from sparksearch.query import ast


def test_terms_agg(mock_index):
    res = run_aggs(mock_index.docs,
                   '{"cats": {"terms": {"field": "category", "size": 3}}}')
    buckets = res["aggregations"]["cats"]["buckets"]
    assert len(buckets) == 3
    # Electronics/Footwear are the biggest categories (5,6... compute: Footwear
    # ids 3,4,5,13,23,33 = 6; Electronics 1,2,12,22,32 = 5)
    assert buckets[0]["key"] == "Footwear" and buckets[0]["doc_count"] == 6
    assert buckets[1]["key"] == "Electronics" and buckets[1]["doc_count"] == 5


def test_terms_with_metrics(mock_index):
    res = run_aggs(mock_index.docs, {
        "cats": {"terms": {"field": "category", "size": 2},
                 "aggs": {"avg_rating": {"avg": {"field": "rating"}},
                          "rating_stats": {"stats": {"field": "rating"}}}}})
    b0 = res["aggregations"]["cats"]["buckets"][0]
    assert b0["key"] == "Footwear"
    assert b0["avg_rating"]["value"] == pytest.approx(24 / 6)
    assert b0["rating_stats"]["count"] == 6
    assert b0["rating_stats"]["sum"] == 24


def test_histogram(mock_index):
    res = run_aggs(mock_index.docs,
                   {"r": {"histogram": {"field": "rating", "interval": 2}}})
    buckets = {b["key"]: b["doc_count"] for b in
               res["aggregations"]["r"]["buckets"]}
    rows = mock_index.docs.groupBy((F.floor(F.col("rating") / 2) * 2)
                                   .alias("k")).count().collect()
    want = {float(r["k"]): r["count"] for r in rows}
    assert buckets == want


def test_date_histogram_calendar(mock_index):
    res = run_aggs(mock_index.docs, {
        "d": {"date_histogram": {"field": "created_at",
                                 "calendar_interval": "month"}}})
    # date_histogram keys are PG-epoch micros; key_as_string is the
    # stable UTC rendering (datetime_stability.out)
    buckets = {b["key_as_string"][:7]: b["doc_count"]
               for b in res["aggregations"]["d"]["buckets"]}
    assert buckets == {"2023-04": 30, "2023-05": 11}
    for b in res["aggregations"]["d"]["buckets"]:
        assert isinstance(b["key"], float)


def test_range_agg(mock_index):
    res = run_aggs(mock_index.docs, {
        "r": {"range": {"field": "rating",
                        "ranges": [{"to": 3}, {"from": 3, "to": 5},
                                   {"from": 5, "key": "high"}]}}})
    buckets = {b["key"]: b["doc_count"] for b in res["aggregations"]["r"]["buckets"]}
    assert buckets["*-3"] == 4      # ratings 1,2 → 1+3
    assert buckets["3-5"] == 25     # ratings 3,4 → 9+16
    assert buckets["high"] == 12    # rating 5


def test_filters_agg(mock_index):
    res = run_aggs(mock_index.docs, {
        "f": {"filters": {"filters": {
            "instock": {"term": {"in_stock": True}},
            "good": {"range": {"rating": {"gte": 4}}}}}}})
    buckets = {b["key"]: b["doc_count"] for b in res["aggregations"]["f"]["buckets"]}
    # first matching named filter wins (single-pass bucketing)
    assert buckets["instock"] == 28


def test_metrics_top_level(mock_index):
    res = run_aggs(mock_index.docs, {
        "n": {"value_count": {"field": "rating"}},
        "card": {"cardinality": {"field": "category"}},
        "s": {"stats": {"field": "rating"}},
        "p": {"percentiles": {"field": "rating", "percents": [50]}}})
    a = res["aggregations"]
    assert a["n"]["value"] == 41
    assert a["card"]["value"] == 10  # approx_count_distinct exact at tiny n
    assert a["s"]["min"] == 1 and a["s"]["max"] == 5
    assert a["p"]["50"] == 4


def test_top_hits(mock_index):
    res = run_aggs(mock_index.docs, {
        "cats": {"terms": {"field": "category", "size": 1},
                 "aggs": {"top": {"top_hits": {
                     "size": 2, "sort": [{"rating": {"order": "desc"}}],
                     "_source": ["id", "rating"]}}}}})
    b0 = res["aggregations"]["cats"]["buckets"][0]
    hits = b0["top"]["hits"]
    assert len(hits) == 2
    assert hits[0]["rating"] >= hits[1]["rating"]


def test_search_aggregate(mock_index):
    # paradedb.aggregate('idx', query, agg): aggregate over search matches
    res = search_aggregate(mock_index, ast.Term("description", "shoes"), {
        "cats": {"terms": {"field": "category"}}})
    buckets = res["aggregations"]["cats"]["buckets"]
    assert buckets == [{"key": "Footwear", "doc_count": 3}]


def test_nested_buckets(mock_index):
    res = run_aggs(mock_index.docs, {
        "stock": {"terms": {"field": "in_stock"},
                  "aggs": {"cats": {"terms": {"field": "category", "size": 2}}}}})
    b = res["aggregations"]["stock"]["buckets"]
    # boolean keys render 0/1 + key_as_string (agg-bool-terms.out)
    assert b[0]["key"] == 1 and b[0]["key_as_string"] == "true"
    assert b[0]["doc_count"] == 28
    assert len(b[0]["cats"]["buckets"]) == 2


def test_bad_agg_raises(mock_index):
    with pytest.raises(AggError):
        run_aggs(mock_index.docs, {"x": {"nope": {"field": "rating"}}})


def test_bucket_limit_guardrail(spark):
    """An unbounded-cardinality bucket level must ABORT past
    config.max_agg_buckets instead of collecting every bucket onto the
    driver (reference: api/aggregate.rs bucket_limit; Tantivy 'too many
    buckets' abort) — and the cap is per collected level, so a terms agg
    whose size cap keeps it under the limit still succeeds."""
    from sparksearch.aggs import AggBucketLimitError
    from sparksearch import config as cfg
    df = spark.range(500).select(F.col("id").cast("double").alias("v"))
    old = cfg.CONFIG.max_agg_buckets
    try:
        cfg.set(max_agg_buckets=100)
        with pytest.raises(AggBucketLimitError, match="max_agg_buckets"):
            run_aggs(df, {"h": {"histogram": {"field": "v", "interval": 1}}})
        # same data, bucket count under the cap → fine
        res = run_aggs(df, {"h": {"histogram": {"field": "v",
                                                "interval": 10}}})
        assert len(res["aggregations"]["h"]["buckets"]) == 50
        # terms size cap bounds the collected level below the limit
        res = run_aggs(df, {"t": {"terms": {"field": "v", "size": 5}}})
        assert len(res["aggregations"]["t"]["buckets"]) == 5
    finally:
        cfg.set(max_agg_buckets=old)


def test_nested_buckets_deep_and_top_hits(mock_index):
    """3-level nesting + per-bucket top_hits; values cross-checked against
    a brute-force pandas twin."""
    res = run_aggs(mock_index.docs, {
        "stock": {"terms": {"field": "in_stock"},
                  "aggs": {"cats": {"terms": {"field": "category", "size": 3}},
                           "r": {"histogram": {"field": "rating", "interval": 2}},
                           "best": {"top_hits": {"size": 1, "_source": ["id"],
                                                 "sort": [{"rating": {"order": "desc"}},
                                                          {"id": {"order": "asc"}}]}}}}})
    import pandas as pd
    from sparksearch.fixtures import mock_items_pdf
    pdf = mock_items_pdf()
    for b in res["aggregations"]["stock"]["buckets"]:
        sub = pdf[pdf.in_stock == b["key"]]
        assert b["doc_count"] == len(sub)
        want_cats = sub.groupby("category").size().sort_values(
            ascending=False).head(50)
        got = {c["key"]: c["doc_count"] for c in b["cats"]["buckets"]}
        assert len(got) == 3
        for k, v in got.items():
            assert want_cats[k] == v
        # histogram twin
        want_h = sub.groupby((sub.rating // 2) * 2).size()
        got_h = {c["key"]: c["doc_count"] for c in b["r"]["buckets"]}
        assert got_h == {float(k): int(v) for k, v in want_h.items()}
        # per-bucket top hit = max rating, min id tiebreak
        top = sub.sort_values(["rating", "id"], ascending=[False, True]).iloc[0]
        assert b["best"]["hits"] == [{"id": int(top["id"])}]


def test_nested_aggs_job_count(mock_index, spark):
    """Scale regression: nested aggs must run O(levels) Spark jobs, not
    O(buckets) (aggs compile to one multi-key groupBy per level)."""
    tracker = spark.sparkContext.statusTracker()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        before = len(tracker.getJobIdsForGroup(None) or [])
        # 5 parent buckets × (sub-terms + top_hits): the old per-bucket plan
        # launched ~2 jobs per parent bucket (~15 total); the level plan is
        # one job per collect (parents, children, top_hits) + one broadcast
        run_aggs(mock_index.docs, {
            "r": {"histogram": {"field": "rating", "interval": 1},
                  "aggs": {"cats": {"terms": {"field": "category", "size": 2}},
                           "h": {"top_hits": {"size": 1, "_source": ["id"],
                                              "sort": [{"id": {"order": "asc"}}]}}}}})
        import time as _t
        _t.sleep(0.5)
        after = len(tracker.getJobIdsForGroup(None) or [])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    n_jobs = after - before
    assert n_jobs <= 6, f"nested agg launched {n_jobs} jobs (per-bucket re-scan?)"


def test_terms_envelope_and_boolean_keys(spark):
    """reference agg-bool-terms.out: boolean terms buckets render key 0/1
    + key_as_string, exact accounting fields present."""
    from sparksearch.aggs import run_aggs
    rows = [("quarterly report draft", "finance", True),
            ("annual budget summary", "finance", False),
            ("project kickoff notes", "engineering", True),
            ("sprint retrospective", "engineering", True),
            ("company policy update", "hr", False),
            ("onboarding checklist", "hr", False),
            ("architecture design doc", "engineering", False)]
    df = spark.createDataFrame(
        rows, "body string, category string, has_attachment boolean")
    res = run_aggs(df, {"a": {"terms": {"field": "has_attachment",
                                        "size": 10}}})
    env = res["aggregations"]["a"]
    assert env["buckets"] == [
        {"key": 0, "doc_count": 4, "key_as_string": "false"},
        {"key": 1, "doc_count": 3, "key_as_string": "true"}]
    assert env["sum_other_doc_count"] == 0
    assert env["doc_count_error_upper_bound"] == 0
    # size cap: docs beyond the returned buckets land in sum_other
    res2 = run_aggs(df, {"a": {"terms": {"field": "category", "size": 1}}})
    env2 = res2["aggregations"]["a"]
    assert env2["buckets"] == [{"key": "engineering", "doc_count": 3}]
    assert env2["sum_other_doc_count"] == 4


def test_zero_count_parent_emits_defined_subbuckets(spark):
    """Regression (round-4 fuzz, seed 4052 distilled): a DEFINED bucket
    with zero matching docs — a no-match named filter, or a parent all
    of whose docs fall outside every defined range — must still emit
    every defined range/filters sub-bucket at doc_count 0 with NULL
    metrics, at every nesting depth.  ES keyed-bucket semantics; the
    SQL twin COUNT(*) FILTER (WHERE ...) returns 0, never drops rows."""
    from sparksearch.aggs import run_aggs
    df = spark.createDataFrame(
        [("a", 5), ("b", 7)], "category string, rating int")
    spec = {"a0": {
        "filters": {"filters": {
            "none": {"term": {"category": "zzz"}},
            "all": {"match_all": {}}}},
        "aggs": {
            "m0": {"sum": {"field": "rating"}},
            "b0": {"range": {"field": "rating",
                             "ranges": [{"key": "lo", "to": 1},
                                        {"key": "hi", "from": 1}]},
                   "aggs": {"m1": {"stats": {"field": "rating"}},
                            "b1": {"filters": {"filters": {
                                "x": {"term": {"category": "a"}}}}}}}}}}
    env = run_aggs(df, spec)["aggregations"]["a0"]
    by_name = {b["key"]: b for b in env["buckets"]}
    assert set(by_name) == {"none", "all"}
    none = by_name["none"]
    assert none["doc_count"] == 0 and none["m0"] == {"value": None}
    # nested range under the empty parent: both DEFINED buckets at 0
    rb = none["b0"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in rb] == [("lo", 0), ("hi", 0)]
    assert rb[0]["m1"] == {"count": None, "min": None, "max": None,
                           "avg": None, "sum": None}
    # and the grandchild filters bucket is still DEFINED at 0
    assert rb[0]["b1"]["buckets"] == [{"key": "x", "doc_count": 0}]
    # the non-empty parent keeps real counts alongside
    all_b = by_name["all"]
    assert all_b["doc_count"] == 2 and all_b["m0"] == {"value": 12}
    got = {b["key"]: b["doc_count"] for b in all_b["b0"]["buckets"]}
    assert got == {"lo": 0, "hi": 2}
