"""tokenizer-query-using-alias.out golden (PUBLIC reference behavior):
``t::pdb.alias(X) @@@ 'q'`` routes the query to index field X — here,
querying an ALIASED field name compiles against that field's analyzer
and postings, for the literal / simple / ngram(2,3) / ngram(3,5)
aliases the golden creates over one source column.  An alias that is
not in the index raises the reference's error (``field
'no_such_alias' is not part of the pg_search index``).

(The golden's plan bodies are EXPLAIN output — execution-method
selection, declared N/A; what is ported is the field ROUTING each
Tantivy Query line pins and the error path.  The ``pdb.alias(nope)``
DDL-misuse error is unrepresentable: aliases here are FieldConfig
names by construction, not cast syntax.)

Ref: pg_search/tests/pg_regress/expected/tokenizer-query-using-alias.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def alias_idx(spark):
    docs = spark.createDataFrame([(1, "This is a TEST")],
                                 "id long, t string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="t"),
            FieldConfig(name="literal", source="t", tokenizer="literal"),
            FieldConfig(name="simple", source="t", tokenizer="simple"),
            FieldConfig(name="ngram_2_3", source="t", tokenizer="ngram",
                        tokenizer_opts={"min_gram": 2, "max_gram": 3}),
            FieldConfig(name="ngram_3_5", source="t", tokenizer="ngram",
                        tokenizer_opts={"min_gram": 3, "max_gram": 5})]))


@pytest.mark.parametrize("field", ["t", "simple", "ngram_2_3",
                                   "ngram_3_5"])
def test_alias_routes_to_field(alias_idx, field):
    """count(*) WHERE t::pdb.alias(field) @@@ 'this is a test' → 1:
    the query analyzes with THAT field's tokenizer and matches."""
    got = compile_query(alias_idx,
                        ast.Parse("this is a test", field=field)).count()
    assert got == 1


def test_alias_literal_field_exact_term(alias_idx):
    """The literal alias matches on the WHOLE value, case preserved
    (pdb.literal is the raw tokenizer — literal_normalized is the
    lowercasing variant); query words parse to separate raw terms —
    Tantivy grammar splits before analysis — so the exact term
    surface is === / Term."""
    got = compile_query(alias_idx,
                        ast.Term("literal", "This is a TEST")).count()
    assert got == 1
    got = compile_query(alias_idx,
                        ast.Term("literal", "this is a test")).count()
    assert got == 0


def test_unknown_alias_errors(alias_idx):
    with pytest.raises(KeyError,
                       match=r"field 'no_such_alias' is not part of "
                             r"the pg_search index"):
        compile_query(alias_idx,
                      ast.Parse("this is a test",
                                field="no_such_alias")).count()
