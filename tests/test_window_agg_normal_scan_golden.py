"""window_agg_normal_scan.out golden (PUBLIC reference behavior):
pdb.agg() OVER () window facets over one match set — with and without
ORDER BY (the customer-reported NormalScan fallback), plus the
standalone aggregate — over a 10k-row corpus behind a PARTIAL index
(WHERE deleted_at IS NULL).

Semantics pinned here:
- fieldless lenient parse('education') searches every indexed text
  field; score = Σ per-field BM25 (should-of-fields),
- `is_irs_active = true` over the declared boolean_field contributes
  its term idf to the score (N=9500 indexed docs, df=9000),
- top-5 all score 3.4781258 (ids 165,375,585,795,1005 — i≡165 mod 210
  after the partial-index and is_irs_active exclusions),
- the window facet is computed over the FULL match set regardless of
  the LIMIT cut: {"NY":1740,"CA":1737,"MA":1239,"OR":1238},
- dropping the is_irs_active clause (Test 3) shifts the facet to
  {"NY":1740,"OR":1738,"CA":1737,"MA":1239}.

Ref: pg_search/tests/pg_regress/expected/window_agg_normal_scan.out
"""

import datetime as dt

import numpy as np
import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import aggregate
from sparksearch.query import ast
from sparksearch.query.search import search_with_facets

MISSIONS = [
    "education and literacy programs for communities",
    "support education programs in underserved areas",
    "animal welfare and shelter services",
    "community health services and wellness",
    "education outreach and mentoring",
    "environmental conservation efforts",
    "arts and cultural preservation",
]
KEYWORDS = ["education learning school", "health wellness community",
            "environment conservation nature"]
CITIES = ["Boston", "New York", "Portland", "San Francisco"]
STATES = ["MA", "NY", "OR", "CA"]


def _rows():
    now = dt.datetime(2023, 1, 1)
    return [(i,
             f"Org {i}" + (" Education Fund" if i % 5 == 0 else ""),
             MISSIONS[i % 7], KEYWORDS[i % 3],
             CITIES[i % 4], STATES[i % 4],
             i % 10 != 0,
             now if i % 20 == 0 else None)
            for i in range(1, 10001)]


@pytest.fixture(scope="module")
def nonprofits(spark):
    docs = spark.createDataFrame(
        _rows(), "id int, legal_name string, mission string, "
                 "keywords string, city string, state string, "
                 "is_irs_active boolean, deleted_at timestamp")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="legal_name"),
                     FieldConfig(name="mission"),
                     FieldConfig(name="keywords"),
                     FieldConfig(name="city", tokenizer="literal"),
                     FieldConfig(name="state", tokenizer="literal")],
        boolean_fields=["is_irs_active"],
        predicate="deleted_at IS NULL"))
    return idx


Q_ACTIVE = ast.Boolean(must=[ast.Parse("education", lenient=True),
                             ast.Term("is_irs_active", True)])
FACETS = {"state_facets": {"terms": {"field": "state", "size": 10}}}
BUCKETS_ACTIVE = [("NY", 1740), ("CA", 1737), ("MA", 1239), ("OR", 1238)]


def _bk(env):
    return [(b["key"], b["doc_count"]) for b in env["buckets"]]


def test_window_facets_with_topk_order(nonprofits):
    """Test 1: ORDER BY score DESC LIMIT 5 + pdb.agg OVER ()."""
    page = search_with_facets(nonprofits, Q_ACTIVE, limit=5,
                              order_by=[("score", "desc"),
                                        ("doc_id", "asc")],
                              columns=["id", "legal_name"],
                              facets=FACETS)
    hits = page["hits"]
    assert [h["id"] for h in hits] == [165, 375, 585, 795, 1005]
    assert all(np.float32(h["score"]) == np.float32(3.4781258)
               for h in hits)
    assert hits[0]["legal_name"] == "Org 165 Education Fund"
    assert _bk(page["facets"]["state_facets"]) == BUCKETS_ACTIVE
    assert page["facets"]["state_facets"]["sum_other_doc_count"] == 0


def test_window_facets_without_order(nonprofits):
    """Test 2: no ORDER BY (NormalScan path) — first 5 matches in heap
    (id) order; the facet still covers the full match set."""
    page = search_with_facets(nonprofits, Q_ACTIVE, limit=5,
                              order_by=[("doc_id", "asc")],
                              columns=["id", "legal_name"],
                              facets=FACETS)
    assert [h["id"] for h in page["hits"]] == [1, 3, 4, 5, 6]
    assert page["hits"][3]["legal_name"] == "Org 5 Education Fund"
    assert _bk(page["facets"]["state_facets"]) == BUCKETS_ACTIVE


def test_standalone_agg(nonprofits):
    """Test 3: standalone pdb.agg() without the is_irs_active clause."""
    env = aggregate(nonprofits, ast.Parse("education", lenient=True),
                    {"agg": {"terms": {"field": "state", "size": 10}}})
    assert _bk(env["aggregations"]["agg"]) == \
        [("NY", 1740), ("OR", 1738), ("CA", 1737), ("MA", 1239)]
