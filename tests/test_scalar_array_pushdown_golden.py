"""pushdown_scalar_array_opexr.out golden (PUBLIC reference behavior):
``col = ANY(ARRAY[...])`` pushes into the index as a term_set query
iff the field's terms are raw values — keyword-family text fields and
typed non-text fast fields (int / date / timestamp / uuid-as-keyword).
A text field under a word-splitting tokenizer (whitespace, default)
does NOT push; the qual stays on the heap.

Corpus (deterministic twin of the golden's generate_series(1,1000)):
uuid_col = UUIDS[i%5], text_col = NAMES[i%5], int_col = i%5,
date_col/ts_col = 2023-01-01 + (i%365) days.

Ref: pg_search/tests/pg_regress/expected/pushdown_scalar_array_opexr.out,
pg_search/src/customscan/pushdown.rs.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.pushdown import (compile_scalar_array,
                                        plan_scalar_array)

UUIDS = [f"550e8400-e29b-41d4-a716-44665544000{d}" for d in range(5)]
NAMES = ["Alice", "Bob", "Charlie", "David", "Eve"]


def _rows():
    base = datetime.date(2023, 1, 1)
    out = []
    for i in range(1, 1001):
        d = base + datetime.timedelta(days=i % 365)
        out.append((i, UUIDS[i % 5], NAMES[i % 5], i % 5, d,
                    datetime.datetime(d.year, d.month, d.day)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        _rows(), "id long, uuid_col string, text_col string, "
                 "int_col int, date_col date, ts_col timestamp")


@pytest.fixture(scope="module")
def idx_whitespace(docs):
    # part 1: uuid_col under whitespace, text_col under the default
    # word tokenizer — neither is a raw-term field
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="uuid_col", tokenizer="whitespace"),
                     FieldConfig(name="text_col", tokenizer="default")]))


@pytest.fixture(scope="module")
def idx_keyword(docs):
    # part 2: keyword tokenizers -> raw terms -> pushdown
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="uuid_col", tokenizer="keyword",
                                 lowercase=False),
                     FieldConfig(name="text_col", tokenizer="keyword",
                                 lowercase=False)]))


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def _attr_ids(docs, pred):
    return sorted(r[0] for r in docs.filter(pred).select("id").collect())


def test_whitespace_uuid_not_pushed(idx_whitespace):
    assert plan_scalar_array(idx_whitespace, "uuid_col",
                             UUIDS[:2]) is None


def test_word_tokenized_text_not_pushed(idx_whitespace):
    assert plan_scalar_array(idx_whitespace, "text_col",
                             ["Alice", "Bob"]) is None


def test_heap_fallback_rows_match_sql(idx_whitespace, docs):
    # the declined qual still answers correctly from the heap
    got = compile_scalar_array(idx_whitespace, "uuid_col", UUIDS[:2])
    assert _ids(got) == _attr_ids(docs, F.col("uuid_col").isin(UUIDS[:2]))
    assert len(_ids(got)) == 400  # i%5 in {0,1}


def test_keyword_uuid_pushes_term_set(idx_keyword, docs):
    node = plan_scalar_array(idx_keyword, "uuid_col", UUIDS[:2])
    assert isinstance(node, ast.TermSet)
    got = compile_query(idx_keyword, node)
    assert _ids(got) == _attr_ids(docs, F.col("uuid_col").isin(UUIDS[:2]))


def test_keyword_text_pushes_term_set(idx_keyword, docs):
    node = plan_scalar_array(idx_keyword, "text_col", ["Alice", "Bob"])
    assert isinstance(node, ast.TermSet)
    got = compile_query(idx_keyword, node)
    assert _ids(got) == _attr_ids(docs,
                                  F.col("text_col").isin("Alice", "Bob"))
    assert len(_ids(got)) == 400


def test_int_fast_field_pushes(idx_keyword, docs):
    node = plan_scalar_array(idx_keyword, "int_col", [0, 1])
    assert isinstance(node, ast.TermSet)
    got = compile_query(idx_keyword, node)
    assert _ids(got) == _attr_ids(docs, F.col("int_col").isin(0, 1))


def test_date_fast_field_pushes(idx_keyword, docs):
    days = [datetime.date(2023, 1, 1), datetime.date(2023, 1, 2)]
    node = plan_scalar_array(idx_keyword, "date_col", days)
    assert isinstance(node, ast.TermSet)
    got = compile_query(idx_keyword, node)
    # i%365 == 0 -> {365, 730}; i%365 == 1 -> {1, 366, 731}
    assert _ids(got) == [1, 365, 366, 730, 731]


def test_timestamp_fast_field_pushes(idx_keyword, docs):
    tss = [datetime.datetime(2023, 1, 1), datetime.datetime(2023, 1, 2)]
    node = plan_scalar_array(idx_keyword, "ts_col", tss)
    assert isinstance(node, ast.TermSet)
    got = compile_query(idx_keyword, node)
    assert _ids(got) == [1, 365, 366, 730, 731]


def test_combined_boolean_tree(idx_keyword, docs):
    # (uuid_col = ANY(u0,u1) AND text_col IN ('Alice','Bob'))
    #   OR (text_col @@@ 'Alice' AND int_col > 2) -- golden's last plan
    left = ast.Boolean(must=[
        plan_scalar_array(idx_keyword, "uuid_col", UUIDS[:2]),
        plan_scalar_array(idx_keyword, "text_col", ["Alice", "Bob"])])
    right = ast.Boolean(must=[
        ast.Parse("Alice", field="text_col"),
        ast.Range("int_col", lower=2, lower_inclusive=False)])
    got = compile_query(idx_keyword, ast.Boolean(should=[left, right]))
    twin = ((F.col("uuid_col").isin(UUIDS[:2])
             & F.col("text_col").isin("Alice", "Bob"))
            | ((F.col("text_col") == "Alice") & (F.col("int_col") > 2)))
    assert _ids(got) == _attr_ids(docs, twin)


def test_not_in_null_poisons(idx_keyword):
    # <> ALL with a NULL operand matches nothing (SQL three-valued
    # logic, joinscan_notin_null_safety.out)
    node = plan_scalar_array(idx_keyword, "text_col",
                             ["Alice", None], negated=True)
    assert isinstance(node, ast.Empty)
    assert compile_scalar_array(idx_keyword, "text_col",
                                ["Alice", None], negated=True).count() == 0


def test_not_in_pushes_complement(idx_keyword, docs):
    got = compile_scalar_array(idx_keyword, "text_col",
                               ["Alice", "Bob"], negated=True)
    assert _ids(got) == _attr_ids(docs,
                                  ~F.col("text_col").isin("Alice", "Bob"))
    assert len(_ids(got)) == 600
