"""fn_wrapped_agg.out golden (PUBLIC reference behavior, table
replicated inline): pdb.agg(...) OVER () — the full-match-set terms
envelope attached to every row of a TopK page, stable when re-wrapped
(jsonb_pretty / CTE: the envelope VALUE is what matters, so one
assertion covers those framings).

Ref: pg_search/tests/pg_regress/expected/fn_wrapped_agg.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.search import search_with_facets

ROWS = [
    (1, "error in application", "app"),
    (2, "error in database", "db"),
    (3, "warning message", "app"),
    (4, "error in network", "network"),
    (5, "info message", "app"),
]

ENVELOPE = {
    "buckets": [{"key": "app", "doc_count": 3},
                {"key": "db", "doc_count": 1},
                {"key": "network", "doc_count": 1}],
    "sum_other_doc_count": 0,
    "doc_count_error_upper_bound": 0,
}


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(ROWS,
                                 "log_id int, description string, "
                                 "category string")
    return build_index(docs, IndexSchema(
        key_field="log_id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category")]))


def test_window_agg_over_topk_page(idx):
    """Test 1 (and, value-wise, Tests 2-4): pdb.agg terms OVER () with a
    log_id DESC LIMIT 3 page — the envelope aggregates the FULL match
    set, not just the page."""
    page = search_with_facets(idx, ast.All(), limit=3,
                              order_by=[("log_id", "desc")],
                              facets={"agg": {"terms":
                                              {"field": "category"}}})
    hits = [(h["log_id"], h["description"], h["category"])
            for h in page["hits"]]
    assert hits == [(5, "info message", "app"),
                    (4, "error in network", "network"),
                    (3, "warning message", "app")]
    assert page["facets"]["agg"] == ENVELOPE
