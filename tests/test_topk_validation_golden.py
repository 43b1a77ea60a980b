"""topk_validation.out golden (PUBLIC reference behavior): the
paradedb.check_topk_scan GUC warns — with the reference's exact text —
when a LIMIT query cannot ride the TopK scan, and stays silent when it
can.  Scenarios ported (mock_items is the reference's
create_bm25_test_table corpus, here named test_products):

1. validation OFF → no warning, rows 5/3/4 (byte-ordered descriptions);
2. validation ON + ORDER BY a non-fast tokenized text field → the
   "cannot be pushed down" warning, same rows;
3. ORDER BY a fast numeric field → no warning, ids 12/1/2/22/32;
4. six ORDER BY columns → the "maximum 5" warning (rows: none match
   'electronics' under the keyword tokenizer — case-sensitive raw term).

Scenario 5 (lower() expression index) is test_topk_lower_text_golden.

Ref: pg_search/tests/pg_regress/expected/topk_validation.out
"""

import warnings

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch import config as sscfg
from sparksearch.fixtures import mock_items
from sparksearch.query import ast, search

SHOES_PAGE = [(5, "Generic shoes"), (3, "Sleek running shoes"),
              (4, "White jogging shoes")]


@pytest.fixture(scope="module")
def products_base(spark):
    """products_base_idx: category raw-fast, description NOT fast,
    rating numeric-fast."""
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", tokenizer="raw",
                                 fast=True, lowercase=False),
                     FieldConfig(name="description", fast=False)]))
    idx.table_name = "test_products"
    return idx


@pytest.fixture(scope="module")
def products_multi(spark):
    """products_multi_idx: keyword category/description, numeric rating."""
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", tokenizer="keyword",
                                 fast=True, lowercase=False),
                     FieldConfig(name="description", tokenizer="keyword",
                                 fast=True, lowercase=False)]))
    idx.table_name = "test_products"
    return idx


def _shoes_rows(idx):
    return [(r["id"], r["description"]) for r in
            search(idx, ast.Parse("shoes", field="description"), limit=5,
                   order_by=[("description", "asc"), ("id", "asc")],
                   columns=["id", "description"], with_score=False)
            .collect()]


def test_1_validation_off_no_warning(products_base):
    old = sscfg.get().check_topk_scan
    sscfg.set(check_topk_scan=False)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert _shoes_rows(products_base) == SHOES_PAGE
    finally:
        sscfg.set(check_topk_scan=old)


def test_2_nonfast_order_warns_reference_text(products_base):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _shoes_rows(products_base) == SHOES_PAGE
    msgs = [str(x.message) for x in w]
    assert any(m == (
        "Query has LIMIT 5 but is not using Top K scan (using Normal "
        "instead). Reason: ORDER BY columns cannot be pushed down to the "
        "index. This may cause poor performance on large datasets. "
        "Remedies: Ensure ORDER BY columns are indexed. Numeric columns "
        "are fast by default. For string columns, use pdb.literal "
        "tokenizer. To disable this warning: SET paradedb.check_topk_scan "
        "= false (table: test_products)") for m in msgs), msgs


def test_3_fast_numeric_topk_no_warning(products_base):
    """category @@@ 'electronics' under the raw tokenizer is
    case-sensitive in the reference — the golden's Test 3 matches via
    the parse path on the RAW stored value 'Electronics'; the row page
    is ids 12, 1, 2, 22, 32 by (rating desc, id asc)."""
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = search(products_base, ast.Term("category", "Electronics"),
                      limit=5, order_by=[("rating", "desc"), ("id", "asc")],
                      columns=["id", "category", "rating"],
                      with_score=False).collect()
    assert [(r["id"], r["rating"]) for r in rows] == \
        [(12, 5), (1, 4), (2, 4), (22, 4), (32, 3)]
    assert all(r["category"] == "Electronics" for r in rows)


def test_4_six_order_by_columns_warns_max5(products_multi):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = search(products_multi, ast.Term("category", "electronics"),
                      limit=10,
                      order_by=[("rating", "desc"), ("created_at", "desc"),
                                ("id", "desc"), ("category", "desc"),
                                ("description", "desc"),
                                ("last_updated_date", "desc")],
                      columns=["id"], with_score=False).collect()
    msgs = [str(x.message) for x in w]
    assert any(m == (
        "Query has LIMIT 10 but is not using Top K scan (using Normal "
        "instead). Reason: ORDER BY has 6 columns but Top K supports "
        "maximum 5. This may cause poor performance on large datasets. "
        "Remedies: Reduce ORDER BY columns to 5 or fewer. To disable "
        "this warning: SET paradedb.check_topk_scan = false "
        "(table: test_products)") for m in msgs), msgs
    # keyword tokenizer stores the raw cased value -> 'electronics'
    # matches nothing (the golden's 0-row result)
    assert rows == []
