"""issue_3711.out golden (PUBLIC reference behavior): NUMERIC
expression index fields with aliases — ``(i * 2)::pdb.alias(
'another_name')``, an immutable SQL function ``add_two_numbers(i,
j)``, and two expression fields in one index — predicates over the
expression (``(i * 2) = 2``) compile to term queries against the
aliased field, conjoined with pdb.all(), and return the matching rows.

Ref: pg_search/tests/pg_regress/expected/issue_3711.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [(1, 1, 2), (2, 2, 3), (3, 3, 4)]


def _ints(spark):
    return spark.createDataFrame(ROWS, "id long, i int, j int")


def _rows(idx, docs, q):
    m = compile_query(idx, q).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .orderBy("id").collect())
    return [(r["id"], r["i"], r["j"]) for r in got]


def test_doubled_expression_alias(spark):
    docs = _ints(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[],
        numeric_fields=[("another_name", "i * 2")]))
    q = ast.Boolean(must=[ast.All(), ast.Term("another_name", 2)])
    assert _rows(idx, docs, q) == [(1, 1, 2)]


def test_sql_function_expression_alias(spark):
    """add_two_numbers(i, j) — an immutable function over two columns;
    the engine's analog is the SQL expression itself."""
    docs = _ints(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[],
        numeric_fields=[("another_name", "i + j")]))
    q = ast.Boolean(must=[ast.All(), ast.Term("another_name", 5)])
    assert _rows(idx, docs, q) == [(2, 2, 3)]


def test_two_expression_fields_conjunction(spark):
    docs = _ints(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[],
        numeric_fields=[("doubled", "i * 2"), ("sum", "i + j")]))
    q = ast.Boolean(must=[ast.All(), ast.Term("doubled", 4),
                          ast.Term("sum", 5)])
    assert _rows(idx, docs, q) == [(2, 2, 3)]


def test_plain_numeric_fields_still_validate(spark):
    docs = _ints(spark)
    with pytest.raises(ValueError, match=r"the column `nope` does not "
                                         r"exist in the USING clause"):
        build_index(docs, IndexSchema(
            key_field="id", text_fields=[],
            numeric_fields=["nope"]))
