"""parse.out golden (PUBLIC reference behavior): pdb.parse /
pdb.parse_with_field over the mock_items regress corpus.

Covers: grouped field targeting with the default-OR implicit operator
(`description:(running shoes) AND category:footwear`),
``conjunction_mode => true`` flipping the implicit operator to AND,
``parse_with_field(..., lenient => true)``, and quoted datetime terms
over typed columns — timestamp, date, time, timestamptz, timetz — where
'2023-05-01 09:12:34', with or without a '+00' zone, resolves to the
same canonical UTC term the index stores (the new ``datetime``
tokenizer; Tantivy types date fields the same way).

Ref: pg_search/tests/pg_regress/expected/parse.out
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import parse_query


@pytest.fixture(scope="module")
def parse_idx(spark):
    # ALTER TABLE mock_items ADD created_at_tz, latest_available_time_tz
    # (golden setup): tz twins of the naive columns, zone +00
    docs = (mock_items(spark)
            .withColumn("created_at_tz", F.col("created_at"))
            .withColumn("latest_available_time_tz",
                        F.concat(F.col("latest_available_time"),
                                 F.lit("+00"))))
    schema = IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description", tokenizer="default"),
            # parse.out's CREATE INDEX lists category with NO opclass →
            # the default text tokenizer (so category:footwear matches
            # the lowercased token of 'Footwear')
            FieldConfig(name="category", tokenizer="default"),
            FieldConfig(name="created_at", tokenizer="datetime"),
            FieldConfig(name="last_updated_date", tokenizer="datetime"),
            FieldConfig(name="latest_available_time", tokenizer="keyword",
                        lowercase=False),
            FieldConfig(name="created_at_tz", tokenizer="datetime"),
            FieldConfig(name="latest_available_time_tz",
                        tokenizer="keyword", lowercase=False),
        ])
    return build_index(docs, schema), docs


def _run(idx, docs, q, **kw):
    node = parse_query(q, "description", idx.schema, **kw)
    out = (compile_query(idx, node)
           .join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
           .orderBy("doc_id"))
    return [r["doc_id"] for r in out.collect()]


def test_parse_grouped_fields_default_or(parse_idx):
    # description:(running shoes) = running OR shoes; AND category
    idx, docs = parse_idx
    got = _run(idx, docs,
               "description:(running shoes) AND category:footwear")
    assert got == [3, 4, 5]


def test_parse_conjunction_mode(parse_idx):
    # conjunction_mode => true: implicit operator becomes AND
    idx, docs = parse_idx
    got = _run(idx, docs,
               "description:(running shoes) AND category:footwear",
               conjunction_mode=True)
    assert got == [3]


def test_parse_with_field_lenient(parse_idx):
    idx, docs = parse_idx
    got = _run(idx, docs, "(running shoes)", lenient=True)
    assert got == [3, 4, 5]


def test_parse_timestamp_term(parse_idx):
    idx, docs = parse_idx
    assert _run(idx, docs, 'created_at:"2023-05-01 09:12:34"') == [1]


def test_parse_date_term(parse_idx):
    idx, docs = parse_idx
    assert _run(idx, docs, 'last_updated_date:"2023-05-03"') == [1, 5, 28]


def test_parse_time_term(parse_idx):
    idx, docs = parse_idx
    assert _run(idx, docs, 'latest_available_time:"09:12:34"') == [1]


def test_parse_timestamptz_term(parse_idx):
    # '+00' zone form resolves to the same canonical UTC term
    idx, docs = parse_idx
    assert _run(idx, docs, 'created_at_tz:"2023-05-01 09:12:34+00:00"') \
        == [1]


def test_parse_timetz_term(parse_idx):
    idx, docs = parse_idx
    assert _run(idx, docs, 'latest_available_time_tz:"09:12:34+00"') == [1]


def test_datetime_tokenizer_canonical_forms(spark):
    """All ISO renderings of one instant hit the same dictionary term;
    py and JVM analyzer twins agree."""
    from sparksearch.analysis import py_tokenize
    forms = ["2023-05-03", "2023-05-03 00:00:00", "2023-05-03T00:00:00Z",
             "2023-05-03 02:00:00+02:00"]
    toks = {tuple(py_tokenize(f, "datetime")) for f in forms}
    assert toks == {("2023-05-03T00:00:00Z",)}
    # non-datetime strings index raw
    assert py_tokenize("09:12:34+00", "datetime") == ["09:12:34+00"]

    from sparksearch.analysis import _jvm_token_array
    from sparksearch.schema import FieldConfig as FC
    df = spark.createDataFrame([(f,) for f in forms] + [("09:12:34+00",)],
                               "s string")
    got = [r[0] for r in df.select(_jvm_token_array(
        F.col("s"), FC(name="s", tokenizer="datetime"))).collect()]
    assert got == [["2023-05-03T00:00:00Z"]] * 4 + [["09:12:34+00"]]
