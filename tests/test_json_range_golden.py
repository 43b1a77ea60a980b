"""json_range.out parity: range queries against JSON-column subpaths —
numeric subpaths compare numerically, datetime subpaths compare as
instants (the legacy ``is_datetime`` form and the native tstzrange form
produce the same rows)."""

import datetime as dt

import pytest

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def json_range_index(spark):
    # json_range.out corpus: 3 docs with nested numeric + tstz subpaths
    rows = [
        (1, '{"attributes": {"score": 3, "tstz": "2023-05-01T08:12:34Z"}}'),
        (2, '{"attributes": {"score": 4, "tstz": "2023-05-01T09:12:34Z"}}'),
        (3, '{"attributes": {"score": 5, "tstz": "2023-05-01T10:12:34Z"}}'),
    ]
    docs = spark.createDataFrame(rows, "id int, metadata string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata", tokenizer="json")]))


def _ids(idx, q):
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


def test_numeric_subpath_range(json_range_index):
    """paradedb.range('metadata.attributes.score', int4range(4, NULL,
    '[)')) → ids 2, 3 (and the legacy lower_bound/included JSONB form is
    the same AST node)."""
    q = ast.Range("metadata.attributes.score", lower=4, upper=None,
                  lower_inclusive=True)
    assert _ids(json_range_index, q) == [2, 3]


def test_numeric_subpath_bounded(json_range_index):
    q = ast.Range("metadata.attributes.score", lower=4, upper=5,
                  lower_inclusive=True, upper_inclusive=False)
    assert _ids(json_range_index, q) == [2]


def test_datetime_subpath_range_string_bound(json_range_index):
    """tstzrange('2023-05-01T09:12:00Z', NULL, '[)') → ids 2, 3; the
    legacy form passes the bound as an RFC3339 string + is_datetime."""
    q = ast.Range("metadata.attributes.tstz",
                  lower="2023-05-01T09:12:00Z", upper=None,
                  lower_inclusive=True)
    assert _ids(json_range_index, q) == [2, 3]


def test_datetime_subpath_range_datetime_bound(json_range_index):
    """Native datetime bound — same rows as the string form."""
    q = ast.Range("metadata.attributes.tstz",
                  lower=dt.datetime(2023, 5, 1, 9, 12, 0,
                                    tzinfo=dt.timezone.utc),
                  upper=None, lower_inclusive=True)
    assert _ids(json_range_index, q) == [2, 3]


def test_datetime_subpath_mixed_rendering(json_range_index):
    """Instant comparison: a '+02:00'-offset bound naming the same
    instant as '09:12:00Z' selects the same rows."""
    q = ast.Range("metadata.attributes.tstz",
                  lower="2023-05-01T11:12:00+02:00", upper=None,
                  lower_inclusive=True)
    assert _ids(json_range_index, q) == [2, 3]


def test_datetime_subpath_upper_bound(json_range_index):
    q = ast.Range("metadata.attributes.tstz",
                  lower="2023-05-01T08:12:34Z",
                  upper="2023-05-01T10:12:34Z",
                  lower_inclusive=True, upper_inclusive=False)
    assert _ids(json_range_index, q) == [1, 2]
