"""LIMIT × post-filter golden, ported from the reference pg_regress
limit_pushdown_basescan.out (PUBLIC reference behavior, table replicated
inline).

The guarded bug class: a query-level LIMIT must NOT cap the scan BEFORE a
non-pushable post-filter (HeapFilter / SubPlan) runs — high-scoring rows
that fail the post-filter would otherwise eat the budget and the query
returns fewer (or zero) rows than correct.  Setup: 1000 rows all matching
'searchable'; rows 151-1000 repeat the term 5× (much higher BM25 score)
but fail the category filter; rows 1-150 pass it.
"""

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.search import search


@pytest.fixture(scope="module")
def lp_items_index(spark):
    rows = []
    for i in range(1, 1001):
        if i <= 150:
            cat, desc = None, "searchable"
        else:
            cat, desc = 999, " ".join(["searchable"] * 5)
        rows.append((i, cat, 1, "active", i, desc))
    docs = spark.createDataFrame(
        rows, "id long, category_id long, tenant_id long, status string, "
              "fk long, description string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))


# the SubPlan (SELECT id FROM lp_categories WHERE name='rare_category')
# resolves to {1}; the heap filter carries the same boolean
_PRED = "category_id IS NULL OR category_id IN (1)"


def _q():
    return ast.HeapFilter(ast.Parse("searchable", field="description"), _PRED)


def test_limit_after_post_filter_golden(lp_items_index):
    """Test 1: score-DESC LIMIT 50 over the post-filtered set → exactly
    50 rows, all from the low-scoring-but-passing ids 1-150 (the buggy
    scan-level cap would return 0)."""
    got = search(lp_items_index, _q(), limit=50, columns=["id"]).collect()
    assert len(got) == 50
    assert all(r["id"] <= 150 for r in got)


def test_no_limit_returns_all_matching_golden(lp_items_index):
    """Test 2: without LIMIT, all 150 qualifying rows return."""
    assert search(lp_items_index, _q(), columns=["id"]).count() == 150


def test_parameterized_limit_golden(lp_items_index):
    """Test 4: LIMIT 100 over the post-filtered set → 100 rows."""
    assert search(lp_items_index, _q(), limit=100,
                  columns=["id"]).count() == 100


def test_fully_pushable_limit_golden(lp_items_index):
    """Test 3: with no post-filter the TopK cap applies directly —
    LIMIT 100 of 1000 matches → 100 rows, highest scores (5× tf) first."""
    got = search(lp_items_index, ast.Parse("searchable", field="description"),
                 limit=100, columns=["id"]).collect()
    assert len(got) == 100
    assert all(r["id"] > 150 for r in got)
