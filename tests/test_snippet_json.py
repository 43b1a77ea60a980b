"""JSON-field snippet + nested-path parity.

Ported from the reference's pg_regress expected output
(tests/pg_regress/expected/snippet_json_01_basic.out): querying a nested
JSON path highlights the extracted value, and snippet_positions returns
its char spans.
"""

from pyspark.sql import functions as F

from sparksearch.analysis import py_tokenize
from sparksearch.highlight import (with_snippet, with_snippet_positions)
from sparksearch.index import build_index
from sparksearch.query import ast, search
from sparksearch.schema import IndexSchema, FieldConfig

ROWS = [
    (1,
     'This is a test test of the snippet function with multiple test words',
     '{"id": 1, "details": {"author": {"first_name": "John", "last_name": '
     '"Doe", "description": "A test author"}, "stats": {"views": 100, '
     '"likes": 50}}, "active": true}'),
    (2,
     'Another test of the snippet snippet function with repeated snippet '
     'words',
     '{"id": 2, "nested": {"level1": {"level2": {"level3": "deep value"}}, '
     '"array": [1, "two", 3.14]}, "status": "active"}'),
    (3,
     'Yet another test test test of the function function function',
     '{"id": 3, "data": {"numbers": [1.1, 2.2, 3.3], "flags": {"debug": '
     'true, "test": false}}, "tags": ["alpha", "beta"]}'),
]


def _index(spark):
    docs = spark.createDataFrame(
        ROWS, "id int, content string, metadata_jsonb string")
    return docs, build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="content"),
                     FieldConfig(name="metadata_jsonb", tokenizer="json")]))


def test_nested_json_path_query_and_snippet(spark):
    docs, idx = _index(spark)
    q = ast.Parse("metadata_jsonb.details.author.description:test")
    hits = search(idx, q, limit=10,
                  columns=["id", "content", "metadata_jsonb"])
    got = with_snippet(idx, hits, q,
                       "metadata_jsonb.details.author.description").collect()
    # snippet_json_01_basic.out: id=1 | A <b>test</b> author | {{2,6}}
    assert [(r["id"], r["snippet"]) for r in got] == \
        [(1, "A <b>test</b> author")]
    pos = with_snippet_positions(
        idx, hits, q, "metadata_jsonb.details.author.description").collect()
    assert [(p["start"], p["end"]) for p in pos[0]["snippet_positions"]] == \
        [(2, 6)]


def test_nested_json_deep_term(spark):
    docs, idx = _index(spark)
    # 3 levels below the column: nested.level1.level2.level3:"deep value"
    hits = search(idx, ast.Term("metadata_jsonb.nested.level1.level2.level3",
                                "deep"), limit=10, columns=["id"])
    assert [r["id"] for r in hits.collect()] == [2]
    # array elements index at the owning path
    hits2 = search(idx, ast.Term("metadata_jsonb.nested.array", "two"),
                   limit=10, columns=["id"])
    assert [r["id"] for r in hits2.collect()] == [2]
    hits3 = search(idx, ast.Term("metadata_jsonb.tags", "beta"),
                   limit=10, columns=["id"])
    assert [r["id"] for r in hits3.collect()] == [3]


def test_json_default_value_tokenizer_word_splits():
    # reference default: json values are word-split (not raw strings)
    toks = py_tokenize('{"a": "A test author"}', "json", {}, True)
    assert toks == ["a:a", "a:test", "a:author"]


def test_exists_on_json_path(spark):
    """paradedb.exists over a nested json path + GROUP BY json value with
    ORDER/LIMIT (json_groupby_orderby_limit.out shape)."""
    from pyspark.sql import functions as F
    from sparksearch.query.compiler import compile_query
    docs, idx = _index(spark)
    d = compile_query(idx, ast.Exists("metadata_jsonb.details.author.description"))
    assert [r["doc_id"] for r in d.collect()] == [1]
    # group-by json value over exists-filtered docs, order/limit
    j = (compile_query(idx, ast.Exists("metadata_jsonb.id"))
         .join(docs, F.col("doc_id") == docs.id)
         .groupBy(F.get_json_object("metadata_jsonb", "$.id").alias("k"))
         .agg(F.count("*").alias("cnt"))
         .orderBy("k").limit(5))
    assert [(r["k"], r["cnt"]) for r in j.collect()] == \
        [("1", 1), ("2", 1), ("3", 1)]


def test_range_on_json_numeric_path(spark):
    """range over a nested json numeric path compares numerically
    (reference json fast-field range; '100' > '50' lexically is false,
    numerically true)."""
    from sparksearch.query.compiler import compile_query
    docs, idx = _index(spark)
    d = compile_query(idx, ast.Range("metadata_jsonb.details.stats.views",
                                     lower=50, lower_inclusive=False))
    assert [r["doc_id"] for r in d.collect()] == [1]  # views=100
    d2 = compile_query(idx, ast.Range("metadata_jsonb.details.stats.views",
                                      upper=50))
    assert [r["doc_id"] for r in d2.collect()] == []
