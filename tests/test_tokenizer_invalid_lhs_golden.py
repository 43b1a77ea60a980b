"""tokenizer-invalid-lhs.out golden (PUBLIC reference behavior): a
tokenizer cast on the LEFT-hand side of a text query operator only
resolves when it is EXACTLY the indexed expression — alias, tokenizer
and parameters all identical.  A cast with no alias (``t::pdb.literal``,
``t::pdb.ngram(3,6)``), an alias the index doesn't define
(``alias=oopsie``), or extra parameters on a defined alias
(``alias=simple, stemmer=english``) all fail with the reference error
``query is incompatible with pg_search's `@@@(field, TEXT)` operator``
— the same text for every text operator (&&& ||| ### ===) — while the
plain ``t::text @@@ 'this is a test'`` route matches the row.

Ref: pg_search/tests/pg_regress/expected/tokenizer-invalid-lhs.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

QTEXT = "This is a TEST"


@pytest.fixture(scope="module")
def lhs_idx(spark):
    docs = spark.createDataFrame([(1, QTEXT)], "id long, t string")
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


def test_plain_column_lhs_is_valid(lhs_idx):
    """SELECT * WHERE t::text @@@ 'this is a test' → row 1."""
    got = compile_query(lhs_idx,
                        ast.Parse("this is a test", field="t")).count()
    assert got == 1


def test_exact_cast_resolves(lhs_idx):
    """A cast identical to the indexed expression routes to its alias
    (the valid counterpart the golden's CREATE INDEX defines)."""
    cfg = lhs_idx.schema.resolve_lhs_cast(
        "t", "ngram", {"min_gram": 2, "max_gram": 3}, alias="ngram_2_3")
    assert cfg.name == "ngram_2_3"


OPS = ["@@@", "&&&", "|||", "###", "==="]


@pytest.mark.parametrize("op", OPS)
def test_cast_without_alias_errors(lhs_idx, op):
    """(t::pdb.literal) <op> 'This is a TEST' — no alias → never
    resolves, even though an aliased literal expression is indexed."""
    with pytest.raises(ValueError,
                       match=rf"query is incompatible with pg_search's "
                             rf"`{op}\(field, TEXT\)` operator: "
                             rf"`This is a TEST`"):
        lhs_idx.schema.resolve_lhs_cast("t", "literal", operator=op,
                                        query_text=QTEXT)


@pytest.mark.parametrize("op", OPS)
def test_unknown_alias_errors(lhs_idx, op):
    """(t::pdb.simple('alias=oopsie')) <op> ... — alias not indexed."""
    with pytest.raises(ValueError, match=r"query is incompatible"):
        lhs_idx.schema.resolve_lhs_cast("t", "simple", alias="oopsie",
                                        operator=op, query_text=QTEXT)


@pytest.mark.parametrize("op", OPS)
def test_param_mismatch_on_defined_alias_errors(lhs_idx, op):
    """(t::pdb.simple('alias=simple','stemmer=english')) <op> ... —
    the alias exists but the cast's parameters differ from the indexed
    expression, so it is NOT the same expression → error."""
    with pytest.raises(ValueError, match=r"query is incompatible"):
        lhs_idx.schema.resolve_lhs_cast(
            "t", "simple", alias="simple",
            filters=[("stemmer", "english")],
            operator=op, query_text=QTEXT)


@pytest.mark.parametrize("op", OPS)
def test_typmod_mismatch_errors(lhs_idx, op):
    """(t::pdb.ngram(3, 6)) <op> ... — no indexed ngram(3,6) expression
    (the index has 2,3 and 3,5) and no alias → error."""
    with pytest.raises(ValueError, match=r"query is incompatible"):
        lhs_idx.schema.resolve_lhs_cast(
            "t", "ngram", {"min_gram": 3, "max_gram": 6},
            operator=op, query_text=QTEXT)
