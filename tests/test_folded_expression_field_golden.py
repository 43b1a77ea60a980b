"""issue_4028.out golden (PUBLIC reference behavior):
``lower(description)::pdb.literal_normalized('ascii_folding=true')`` —
an expression-source literal field whose terms are lowercased AND
ascii-folded, so `=== 'cloud engineer'` matches every case variant
INCLUDING the accented 'Clōüd engineer'; ORDER BY the raw expression
puts the accented value last (byte order: 'o' < 'ō').

Ref: pg_search/tests/pg_regress/expected/issue_4028.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [(1, "Cloud Engagement Manager"), (2, "cloud engineer"),
        (3, "Clōüd engineer"), (4, "cloud Engineer"),
        (5, "Cloud engineer")]


def test_folded_literal_expression_equality(spark):
    docs = spark.createDataFrame(ROWS, "id int, description string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(
            name="folded", source="lower(description)",
            tokenizer="literal_normalized",
            filters=["ascii_folding"])]))
    m = compile_query(idx, ast.Term("folded", "cloud engineer")) \
        .select("doc_id")
    got = (docs.join(m, docs["id"] == F.col("doc_id"), "left_semi")
           .orderBy(F.lower("description"), "id")
           .limit(10).collect())
    assert [(r["id"], r["description"]) for r in got] == [
        (2, "cloud engineer"), (4, "cloud Engineer"),
        (5, "Cloud engineer"), (3, "Clōüd engineer")]
