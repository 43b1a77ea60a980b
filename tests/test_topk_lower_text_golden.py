"""topk-lower-text.out golden (PUBLIC reference behavior): an index
field built from the expression ``lower(description)`` under the
``pdb.literal`` (keyword, no lowercase-normalizer) tokenizer serves
``ORDER BY lower(description) ... LIMIT k`` as a TopK scan, while
``ORDER BY description`` (the raw column, which the index does NOT
store) falls back to Normal+Sort and fires the check_topk_scan
planner WARNING text-for-text.  Rows are identical either way.

Ref: pg_search/tests/pg_regress/expected/topk-lower-text.out
"""

import warnings

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch import config as sscfg
from sparksearch.fixtures import mock_items
from sparksearch.query import ast, search


@pytest.fixture(scope="module")
def lower_literal_index(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description",
                                 source="lower(description)",
                                 tokenizer="keyword", lowercase=False)]))
    idx.table_name = "mock_items"
    return idx


TERM = ast.Term("description", "sleek running shoes")


def test_topk_pushed_order_no_warning(lower_literal_index):
    # ORDER BY lower(description) DESC LIMIT 5 -> TopK scan, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = search(lower_literal_index, TERM, limit=5,
                      order_by=[("lower(description)", "desc")],
                      columns=["description", "rating"],
                      with_score=False).collect()
    assert [(r[0], r[1]) for r in rows] == [("Sleek running shoes", 5)]


def test_unpushable_order_warns_reference_text(lower_literal_index):
    # ORDER BY description DESC LIMIT 5: the index stores
    # lower(description), not description -> Normal + Sort + WARNING
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = search(lower_literal_index, TERM, limit=5,
                      order_by=[("description", "desc")],
                      columns=["description", "rating"],
                      with_score=False).collect()
    msgs = [str(x.message) for x in w]
    assert any(m == (
        "Query has LIMIT 5 but is not using Top K scan (using Normal "
        "instead). Reason: ORDER BY columns cannot be pushed down to the "
        "index. This may cause poor performance on large datasets. "
        "Remedies: Ensure ORDER BY columns are indexed. Numeric columns "
        "are fast by default. For string columns, use pdb.literal "
        "tokenizer. To disable this warning: SET paradedb.check_topk_scan "
        "= false (table: mock_items)") for m in msgs), msgs
    # identical rows despite the degraded plan
    assert [(r[0], r[1]) for r in rows] == [("Sleek running shoes", 5)]


def test_guc_disables_warning(lower_literal_index):
    # SET paradedb.check_topk_scan = false silences it
    old = sscfg.get().check_topk_scan
    sscfg.set(check_topk_scan=False)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            search(lower_literal_index, TERM, limit=5,
                   order_by=[("description", "desc")],
                   with_score=False).collect()
    finally:
        sscfg.set(check_topk_scan=old)


def test_numeric_order_never_warns(lower_literal_index):
    # "Numeric columns are fast by default" — rating rides the TopK scan
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = search(lower_literal_index, TERM, limit=5,
                      order_by=[("rating", "desc"), ("id", "asc")],
                      columns=["description", "rating"],
                      with_score=False).collect()
    assert [(r[0], r[1]) for r in rows] == [("Sleek running shoes", 5)]
