"""aliased_text_expression_resolution.out golden (PUBLIC reference
behavior): a query referencing a COLUMN resolves against the index's
fields — a direct/un-aliased field of that name always wins; with no
direct field, a single aliased expression sourced from the column is
chosen; several candidates raise the reference's ambiguity error.

Ref: pg_search/tests/pg_regress/expected/
aliased_text_expression_resolution.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

NEEDLE = "sleek running shoes"


def _rows(idx, docs):
    m = compile_query(idx, ast.Match("description", NEEDLE)) \
        .select("doc_id")
    return sorted(
        r["description"] for r in
        docs.join(m, docs["id"] == m["doc_id"], "left_semi")
        .select("description").collect())


def test_single_aliased_expression_resolves(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="literal_description",
                                 source="lower(description)",
                                 tokenizer="keyword", lowercase=False)]))
    assert _rows(idx, docs) == ["Sleek running shoes"]


def test_direct_column_takes_precedence(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description", tokenizer="simple"),
            FieldConfig(name="simple_description", source="description",
                        tokenizer="simple"),
            FieldConfig(name="literal_description",
                        source="lower(description)",
                        tokenizer="keyword", lowercase=False)]))
    assert _rows(idx, docs) == ["Generic shoes", "Sleek running shoes",
                                "White jogging shoes"]


def test_unaliased_tokenized_column_wins(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description", tokenizer="simple"),
            FieldConfig(name="literal_description",
                        source="lower(description)",
                        tokenizer="keyword", lowercase=False)]))
    assert _rows(idx, docs) == ["Generic shoes", "Sleek running shoes",
                                "White jogging shoes"]


def test_multiple_aliased_expressions_ambiguous(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="simple_description", source="description",
                        tokenizer="simple"),
            FieldConfig(name="literal_description",
                        source="lower(description)",
                        tokenizer="keyword", lowercase=False)]))
    with pytest.raises(ValueError,
                       match=r"Query is ambiguous: column `description` "
                             r"matches multiple indexed fields: "
                             r"`literal_description`, "
                             r"`simple_description`\. Use "
                             r"`description::pdb\.alias\(\.\.\.\)` to "
                             r"choose one"):
        compile_query(idx, ast.Match("description", NEEDLE)).collect()
