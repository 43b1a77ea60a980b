"""SQL NULL semantics at the search-operator boundary — rust-suite
parity (PUBLIC reference behavior, corpora replicated inline from
tests/tests/query_edge_cases.rs, issue #5264): negating / composing
``col @@@ query`` predicates must follow Postgres three-valued logic.

``compile_predicate`` exposes the operator as a three-valued boolean
column; Spark's native ``~``/``&``/``|`` then reproduce the reference:

- ``NOT (color @@@ 'blue')`` drops NULL-color rows (NOT NULL = NULL);
- ``NOT (a AND b)`` / ``NOT (a OR b)`` keep rows where three-valued
  evaluation yields FALSE inside the NOT (e.g. NULL AND FALSE = FALSE);
- ``NOT exists('color')`` returns exactly the missing rows — exists is
  an existence predicate (two-valued, FALSE not NULL on missing), even
  wrapped in boost()/const_score();
- an EMPTY text[] is SQL NOT NULL: it negates to TRUE, only a NULL
  array column is dropped.

Ref: tests/tests/query_edge_cases.rs:23-407
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_predicate

_KW = dict(tokenizer="keyword", lowercase=False)


def _ids(df, cond):
    return [r["id"] for r in df.filter(cond).orderBy("id").collect()]


@pytest.fixture(scope="module")
def color_idx(spark):
    docs = spark.createDataFrame(
        [(1, "blue"), (2, "red"), (3, None)], "id int, color string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="color", **_KW)]))


def test_not_operator_preserves_null(color_idx):
    # NOT (color @@@ 'blue') = [2]: the NULL row is NULL, not TRUE
    out = compile_predicate(color_idx, ast.Term("color", "blue"))
    assert _ids(out, ~F.col("__match")) == [2]
    assert _ids(out, F.col("__match")) == [1]


def test_negated_boolean_composition(spark):
    docs = spark.createDataFrame(
        [(1, "blue", "square"), (2, "red", "square"), (3, None, "square"),
         (4, "red", "circle"), (5, None, "circle")],
        "id int, color string, shape string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="color", **_KW),
                                     FieldConfig(name="shape", **_KW)]))
    out = compile_predicate(idx, ast.Term("color", "blue"), name="c")
    out = compile_predicate(idx, ast.Term("shape", "square"), out, name="s")
    # NOT (c AND s): NULL∧TRUE=NULL drops row 3; NULL∧FALSE=FALSE keeps 5
    assert _ids(out, ~(F.col("c") & F.col("s"))) == [2, 4, 5]
    # NOT (c OR s): NULL∨TRUE=TRUE drops 3; NULL∨FALSE=NULL drops 5
    assert _ids(out, ~(F.col("c") | F.col("s"))) == [4]


def test_numeric_not_preserves_null(spark):
    docs = spark.createDataFrame(
        [(1, 7), (2, 8), (3, None)], "id long, quantity int")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[], numeric_fields=["quantity"]))
    out = compile_predicate(idx, ast.Term("quantity", 7))
    # NOT (quantity @@@ '7') counts 1 (row 2), never the NULL row
    assert out.filter(~F.col("__match")).count() == 1


@pytest.fixture(scope="module")
def exists_idx(spark):
    docs = spark.createDataFrame(
        [(1, "blue"), (2, None), (3, "red"), (4, None)],
        "id int, color string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="color", **_KW)]))


def test_exists_present_rows(exists_idx):
    out = compile_predicate(exists_idx, ast.Exists("color"))
    assert _ids(out, F.col("__match")) == [1, 3]


def test_negated_exists_returns_missing_rows(exists_idx):
    out = compile_predicate(exists_idx, ast.Exists("color"))
    assert _ids(out, ~F.col("__match")) == [2, 4]


def test_negated_boosted_exists(exists_idx):
    # boost/const_score wrappers are unwrapped before the null-guard:
    # the wrapped exists is still an existence predicate
    out = compile_predicate(exists_idx,
                            ast.Boost(ast.Exists("color"), 2.0))
    assert _ids(out, ~F.col("__match")) == [2, 4]
    out = compile_predicate(exists_idx,
                            ast.ConstScore(ast.Exists("color"), 1.0))
    assert _ids(out, ~F.col("__match")) == [2, 4]


def test_negated_predicate_empty_array_not_null(spark):
    docs = spark.createDataFrame(
        [(1, ["beer"]), (2, []), (3, None)],
        "id int, tags array<string>")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="tags", **_KW)]))
    out = compile_predicate(idx, ast.Term("tags", "beer"))
    got = _ids(out, ~F.col("__match"))
    assert 2 in got and 1 not in got and 3 not in got


def test_unary_not_over_arrays(spark):
    # query_edge_cases.rs unary_not_issue2141: two-valued counts over a
    # fully-populated text[] column (no NULLs → NOT is plain complement)
    docs = spark.createDataFrame(
        [(1, ["beer", "cheese"]), (2, ["beer", "wine"]),
         (3, ["beer"]), (4, ["beer"])], "id int, value array<string>")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="value")]))
    out = compile_predicate(idx, ast.Parse("beer", field="value"),
                            name="beer")
    out = compile_predicate(idx, ast.Parse("wine", field="value"), out,
                            name="wine")
    out = compile_predicate(idx, ast.Parse("cheese", field="value"), out,
                            name="cheese")
    out = compile_predicate(idx, ast.Parse("missing", field="value"), out,
                            name="missing")
    assert out.filter(F.col("beer")).count() == 4
    assert out.filter(~F.col("beer")).count() == 0
    assert out.filter(F.col("wine")).count() == 1
    assert out.filter(~F.col("wine")).count() == 3
    assert out.filter(F.col("wine") & ~F.col("cheese")).count() == 1
    assert out.filter(~F.col("wine") | ~F.col("missing")).count() == 4
    assert out.filter(~F.col("wine") & ~F.col("cheese")).count() == 2


def test_select_everything_or_true(spark):
    # query_edge_cases.rs select_everything: all() OR id > 0 = every row
    docs = spark.createDataFrame(
        [(1, "beer"), (2, "wine"), (3, "cheese")], "id int, value string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="value")]))
    out = compile_predicate(idx, ast.All())
    assert out.filter(F.col("__match") | (F.col("id") > 0)).count() == 3


def test_query_empty_table(spark):
    docs = spark.createDataFrame([], "id int, value array<string>")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="value")]))
    out = compile_predicate(idx, ast.Parse("beer", field="value"))
    assert out.filter(F.col("__match")).count() == 0
