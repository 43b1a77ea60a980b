"""JSON aggregate golden family, ported from the reference pg_regress
suite (PUBLIC reference behavior, tables replicated inline):

- json_agg.out — terms agg / GROUP BY over a JSON projection
  (metadata_json->>'value') filtered by paradedb.exists, including the
  direct paradedb.aggregate envelope and multi-metric (min/max over
  (->>'count')::INT) variants.
- json_groupby_orderby_limit.out — JSON-path GROUP BY with ORDER BY
  key / ORDER BY count and LIMIT.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.aggs import run_aggs, search_aggregate
from sparksearch.query import ast


@pytest.fixture(scope="module")
def json_test_index(spark):
    """json_agg.out's json_test table (8 rows)."""
    rows = [
        (1, '{"value": "apple", "count": 5}'),
        (2, '{"value": "banana", "count": 3}'),
        (3, '{"value": "apple", "count": 2}'),
        (4, '{"value": "orange", "count": 7}'),
        (5, '{"value": "banana", "count": 1}'),
        (6, '{"value": "apple", "count": 4}'),
        (7, '{"value": "cherry", "count": 6}'),
        (8, '{"value": "banana", "count": 8}'),
    ]
    docs = spark.createDataFrame(rows, "id int, metadata_json string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata_json", tokenizer="json")]))


@pytest.fixture(scope="module")
def json_single_index(spark):
    """json_groupby_orderby_limit.out's json_test_single table (7 rows)."""
    rows = [
        (1, '{"category": "electronics", "brand": "Apple", "price": 999}'),
        (2, '{"category": "electronics", "brand": "Samsung", "price": 799}'),
        (3, '{"category": "electronics", "brand": "Apple", "price": 1299}'),
        (4, '{"category": "clothing", "brand": "Nike", "price": 89}'),
        (5, '{"category": "clothing", "brand": "Adidas", "price": 79}'),
        (6, '{"category": "clothing", "brand": "Nike", "price": 99}'),
        (7, '{"category": "clothing", "brand": "Puma", "price": 99}'),
    ]
    docs = spark.createDataFrame(rows, "id int, metadata string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata", tokenizer="json")]))


def test_json_agg_terms_envelope_golden(json_test_index):
    """json_agg.out Test 4: paradedb.aggregate(index, exists, terms) —
    the exact ES envelope the reference prints."""
    res = search_aggregate(
        json_test_index, ast.Exists("metadata_json.value"),
        {"buckets": {"terms": {"field": "metadata_json.value"}}})
    assert res["aggregations"]["buckets"] == {
        "buckets": [{"key": "apple", "doc_count": 3},
                    {"key": "banana", "doc_count": 3},
                    {"key": "cherry", "doc_count": 1},
                    {"key": "orange", "doc_count": 1}],
        "sum_other_doc_count": 0,
        "doc_count_error_upper_bound": 0,
    }


def test_json_agg_groupby_projection_golden(json_test_index):
    """json_agg.out Tests 1-2: GROUP BY metadata_json->>'value' ORDER BY
    count DESC, value → apple 3, banana 3, cherry 1, orange 1."""
    res = search_aggregate(
        json_test_index, ast.Exists("metadata_json.value"),
        {"v": {"terms": {"field": "metadata_json.value",
                         "order": {"_count": "desc"}}}})
    got = [(b["key"], b["doc_count"])
           for b in res["aggregations"]["v"]["buckets"]]
    assert got == [("apple", 3), ("banana", 3), ("cherry", 1), ("orange", 1)]


def test_json_agg_multiple_metrics_golden(json_test_index):
    """json_agg.out Test 3: COUNT(*), MIN/MAX((->>'count')::INT) per
    value, ORDER BY value."""
    res = search_aggregate(
        json_test_index, ast.Exists("metadata_json.value"),
        {"v": {"terms": {"field": "metadata_json.value",
                         "order": {"_key": "asc"}},
               "aggs": {"min_count": {"min": {"field": "metadata_json.count"}},
                        "max_count": {"max": {"field": "metadata_json.count"}}}}})
    got = [(b["key"], b["doc_count"], b["min_count"]["value"],
            b["max_count"]["value"])
           for b in res["aggregations"]["v"]["buckets"]]
    assert got == [("apple", 3, 2, 5), ("banana", 3, 1, 8),
                   ("cherry", 1, 6, 6), ("orange", 1, 7, 7)]


def test_json_groupby_orderby_limit_golden(json_single_index):
    """json_groupby_orderby_limit.out Test 1: GROUP BY
    metadata->>'category' with exists filter.

    ORDER BY 1 (key asc) LIMIT 5 → clothing 4, electronics 3;
    ORDER BY 2 (count asc) LIMIT 5 → electronics 3, clothing 4."""
    by_key = search_aggregate(
        json_single_index, ast.Exists("metadata.category"),
        {"c": {"terms": {"field": "metadata.category", "size": 5,
                         "order": {"_key": "asc"}}}})
    assert [(b["key"], b["doc_count"])
            for b in by_key["aggregations"]["c"]["buckets"]] == [
        ("clothing", 4), ("electronics", 3)]
    by_count = search_aggregate(
        json_single_index, ast.Exists("metadata.category"),
        {"c": {"terms": {"field": "metadata.category", "size": 5,
                         "order": {"_count": "asc"}}}})
    assert [(b["key"], b["doc_count"])
            for b in by_count["aggregations"]["c"]["buckets"]] == [
        ("electronics", 3), ("clothing", 4)]


def test_json_path_histogram_on_numeric_json(json_single_index):
    """JSON numeric path feeds a histogram (numeric resolve path):
    prices 999/799/1299/89/79/99/99 at interval 500 → [0: 4, 500: 2,
    1000: 1]."""
    res = run_aggs(json_single_index.docs,
                   {"p": {"histogram": {"field": "metadata.price",
                                        "interval": 500}}})
    got = {b["key"]: b["doc_count"] for b in res["aggregations"]["p"]["buckets"]}
    assert got == {0.0: 4, 500.0: 2, 1000.0: 1}


def test_json_term_set_datetime_golden(spark):
    """json_term_set.out: TermSet / Term over a JSON datetime subpath.
    RFC3339-ish JSON string values index as one canonical typed date
    token (Tantivy json date detection), so datetime term queries match
    regardless of rendering (Z suffix vs +00:00 offset vs python
    datetime objects — the reference's '::timestamptz' round-trip)."""
    import datetime as dt
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    rows = [(1, '{"attributes": {"tstz": "2023-05-01T08:12:34Z"}}'),
            (2, '{"attributes": {"tstz": "2023-05-01T09:12:34Z"}}'),
            (3, '{"attributes": {"tstz": "2023-05-01T10:12:34Z"}}')]
    docs = spark.createDataFrame(rows, "id int, metadata string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata", tokenizer="json")]))

    def ids(q):
        return sorted(r["doc_id"] for r in compile_query(idx, q).collect())

    path = "metadata.attributes.tstz"
    # new API: term_set of two timestamps → docs 2,3
    assert ids(ast.TermSet(path, ["2023-05-01T09:12:34Z",
                                  "2023-05-01T10:12:34Z"])) == [2, 3]
    # alternate renderings of the same instants match too
    assert ids(ast.TermSet(path, ["2023-05-01 09:12:34+00:00",
                                  "2023-05-01T12:12:34+02:00"])) == [2, 3]
    # typed python datetimes (the '::timestamptz' form)
    assert ids(ast.TermSet(path, [
        dt.datetime(2023, 5, 1, 9, 12, 34, tzinfo=dt.timezone.utc),
        dt.datetime(2023, 5, 1, 10, 12, 34, tzinfo=dt.timezone.utc),
    ])) == [2, 3]
    # single Term
    assert ids(ast.Term(path, "2023-05-01T08:12:34Z")) == [1]
    # non-matching instant
    assert ids(ast.Term(path, "2023-05-01T23:59:59Z")) == []


def test_json_range_golden(spark):
    """json_range.out: Range over JSON numeric and datetime subpaths.
    Numeric: score >= 4 → {2,3}. Datetime (tstzrange semantics): tstz >=
    2023-05-01T09:12:00Z → {2,3}, matching across renderings."""
    import datetime as dt
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    rows = [
        (1, '{"attributes": {"score": 3, "tstz": "2023-05-01T08:12:34Z"}}'),
        (2, '{"attributes": {"score": 4, "tstz": "2023-05-01T09:12:34Z"}}'),
        (3, '{"attributes": {"score": 5, "tstz": "2023-05-01T10:12:34Z"}}'),
    ]
    docs = spark.createDataFrame(rows, "id int, metadata string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="metadata", tokenizer="json")]))

    def ids(q):
        return sorted(r["doc_id"] for r in compile_query(idx, q).collect())

    # numeric subpath: int4range(4, NULL, '[)')
    assert ids(ast.Range("metadata.attributes.score", lower=4,
                         lower_inclusive=True)) == [2, 3]
    # datetime subpath: tstzrange('2023-05-01T09:12:00Z', NULL, '[)')
    assert ids(ast.Range("metadata.attributes.tstz",
                         lower="2023-05-01T09:12:00Z",
                         lower_inclusive=True)) == [2, 3]
    # alternate rendering of the same bound instant
    assert ids(ast.Range("metadata.attributes.tstz",
                         lower="2023-05-01 11:12:00+02:00",
                         lower_inclusive=True)) == [2, 3]
    # python datetime bound + bounded-above form
    assert ids(ast.Range("metadata.attributes.tstz",
                         lower=dt.datetime(2023, 5, 1, 8, 30,
                                           tzinfo=dt.timezone.utc),
                         upper=dt.datetime(2023, 5, 1, 10, 0,
                                           tzinfo=dt.timezone.utc),
                         lower_inclusive=True, upper_inclusive=False)) == [2]


def test_exists_json_golden(spark):
    """exists_json.out: paradedb.exists over JSON subpaths and the whole
    json column, incl. a NULL json row and an OR with a text query."""
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    rows = [
        (1, "Marketing manager", '{"first_name": "John", "last_name": "Smith"}'),
        (2, "Sales manager", '{"first_name": "Jane"}'),
        (3, "Engineer", '{"last_name": "Wilson"}'),
        (4, "CEO", None),
        (5, "CTO", '{"first_name": "Jim", "last_name": "Johnson"}'),
    ]
    docs = spark.createDataFrame(rows,
                                 "id int, description string, data string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="data", tokenizer="json")]))

    def ids(q):
        return sorted(r["doc_id"] for r in compile_query(idx, q).collect())

    assert ids(ast.Exists("data.first_name")) == [1, 2, 5]
    assert ids(ast.Boolean(should=[ast.Exists("data.last_name"),
                                   ast.Term("description", "ceo")])) \
        == [1, 3, 4, 5]
    assert ids(ast.Exists("data")) == [1, 2, 3, 5]


def test_jsonb_exists_operator_golden(spark):
    """jsonb_exists_operator.out: the JSONB `?` key-exists operator maps
    to Exists over json paths — AND of two keys, nested-path
    (data->'address' ? 'city'), and the OR-with-text case."""
    from sparksearch.query import ast
    from sparksearch.query.compiler import compile_query
    rows = [
        (1, "Marketing manager", '{"first_name": "John", "last_name": "Smith"}'),
        (2, "Sales manager", '{"first_name": "Jane"}'),
        (3, "Engineer", '{"last_name": "Wilson"}'),
        (4, "CEO", None),
        (5, "CTO", '{"first_name": "Jim", "last_name": "Johnson"}'),
        (6, "Intern", '{"address": {"city": "New York", "zip": "10001"}}'),
    ]
    docs = spark.createDataFrame(rows,
                                 "id int, description string, data string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="data", tokenizer="json")]))

    def ids(q):
        return sorted(r["doc_id"] for r in compile_query(idx, q).collect())

    assert ids(ast.Exists("data.first_name")) == [1, 2, 5]
    assert ids(ast.Boolean(should=[ast.Exists("data.last_name"),
                                   ast.Match("description", "CEO")])) \
        == [1, 3, 4, 5]
    assert ids(ast.Boolean(must=[ast.Exists("data.first_name"),
                                 ast.Exists("data.last_name")])) == [1, 5]
    # nested path: data->'address' ? 'city'
    assert ids(ast.Exists("data.address.city")) == [6]
    assert ids(ast.Exists("data.address.country")) == []
