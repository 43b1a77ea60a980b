"""agg-max-pushdown.out golden (PUBLIC reference behavior): MAX/MIN
aggregate pushdown over date/datetime columns — the issue the reference
test pins is "MAX agg pushdown always returns null values for dates";
correct behavior is the real extreme with NULL rows skipped, and a null
envelope value when EVERY row is NULL.

Spark has no TIME/TIMETZ type, so ``t``/``ttz`` index as canonical
fixed-width strings ('HH:MM:SS', 'HH:MM:SS+00') whose byte order IS
time order — MAX/MIN over them match the reference's time extremes.
Datetime metrics return the engine's PG-epoch-µs value +
key_as_string convention (agg-validate.out Tests 16-19).

Ref: pg_search/tests/pg_regress/expected/agg-max-pushdown.out
"""

import datetime as dt

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import aggregate
from sparksearch.query import ast

PG_EPOCH = dt.datetime(2000, 1, 1, tzinfo=dt.timezone.utc)


def _us(*args):
    return float(int((dt.datetime(*args, tzinfo=dt.timezone.utc)
                      - PG_EPOCH).total_seconds() * 1_000_000))


ROWS = [
    (1, dt.date(2051, 1, 2), dt.datetime(2051, 1, 2, 10, 30),
     dt.datetime(2051, 1, 2, 10, 30), "10:30:00", "10:30:00+00"),
    (2, dt.date(2023, 6, 15), dt.datetime(2023, 6, 15, 14, 45, 30),
     dt.datetime(2023, 6, 15, 14, 45, 30), "14:45:30", "14:45:30+00"),
    (3, dt.date(1990, 12, 25), dt.datetime(1990, 12, 25, 8, 0),
     dt.datetime(1990, 12, 25, 8, 0), "08:00:00", "08:00:00+00"),
    (4, None, None, None, None, None),
]


@pytest.fixture(scope="module")
def date_agg(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, d date, ts timestamp, tstz timestamp, "
              "t string, ttz string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="t", tokenizer="keyword",
                                 lowercase=False),
                     FieldConfig(name="ttz", tokenizer="keyword",
                                 lowercase=False)]))
    return idx


def _aggs(idx, q, aggs):
    return aggregate(idx, q, aggs)["aggregations"]


def test_max_min_date(date_agg):
    env = _aggs(date_agg, ast.All(), {
        "mx": {"max": {"field": "d"}}, "mn": {"min": {"field": "d"}}})
    assert env["mx"]["value"] == _us(2051, 1, 2)
    assert env["mx"]["key_as_string"] == "2051-01-02T00:00:00Z"
    assert env["mn"]["value"] == _us(1990, 12, 25)
    assert env["mn"]["key_as_string"] == "1990-12-25T00:00:00Z"


def test_max_min_timestamp(date_agg):
    env = _aggs(date_agg, ast.All(), {
        "mx": {"max": {"field": "ts"}}, "mn": {"min": {"field": "ts"}}})
    assert env["mx"]["value"] == _us(2051, 1, 2, 10, 30)
    assert env["mx"]["key_as_string"] == "2051-01-02T10:30:00Z"
    assert env["mn"]["value"] == _us(1990, 12, 25, 8, 0)


def test_max_min_timestamptz(date_agg):
    env = _aggs(date_agg, ast.All(), {
        "mx": {"max": {"field": "tstz"}}, "mn": {"min": {"field": "tstz"}}})
    # the reference renders 'Mon Jan 02 02:30:00 2051 PST' — the same
    # instant as 2051-01-02 10:30:00+00
    assert env["mx"]["key_as_string"] == "2051-01-02T10:30:00Z"
    assert env["mn"]["key_as_string"] == "1990-12-25T08:00:00Z"


def test_max_min_time_and_timetz(date_agg):
    env = _aggs(date_agg, ast.All(), {
        "mxt": {"max": {"field": "t"}}, "mnt": {"min": {"field": "t"}},
        "mxz": {"max": {"field": "ttz"}}, "mnz": {"min": {"field": "ttz"}}})
    assert env["mxt"]["value"] == "14:45:30"
    assert env["mnt"]["value"] == "08:00:00"
    assert env["mxz"]["value"] == "14:45:30+00"
    assert env["mnz"]["value"] == "08:00:00+00"


def test_plain_agg_twin_matches(date_agg, spark):
    """The 'enable_aggregate_custom_scan = off' verification block: a
    plain heap aggregate must agree with the pushed-down envelope."""
    import pyspark.sql.functions as F
    r = date_agg.docs.agg(F.max("d").alias("mx"),
                          F.min("d").alias("mn")).collect()[0]
    assert (r["mx"], r["mn"]) == (dt.date(2051, 1, 2), dt.date(1990, 12, 25))


def test_all_null_dates(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, None)], "id int, d date")
    idx = build_index(docs, IndexSchema(key_field="id", text_fields=[]))
    env = _aggs(idx, ast.All(), {"mx": {"max": {"field": "d"}}})
    assert env["mx"]["value"] is None
