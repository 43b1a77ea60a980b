"""operators.out parity — the pdb operator surface on mock_items.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/operators.out
(41-row mock_items; index = description default tokenizer, an aliased
expression field lower(description)::pdb.simple, category default
tokenizer).  The golden pins, for each operator:

- ``@@@`` (parse), ``&&&`` (match conjunction), ``|||`` (match
  disjunction), ``###`` (phrase), ``===`` (term / termset) row sets over
  a tokenized text field and over the aliased expression field;
- raw-needle semantics for ``===``: 'SHOES' (unlowercased) matches
  nothing, ARRAY['shoes','SHOES'] matches exactly the 'shoes' rows;
- all five operators over a default-tokenized category field;
- non-text LHS types erroring ``type `X` is not compatible with the
  `OP` operator`` instead of coercing (operators.out tail).

The SQL-expression LHS forms (``lower(description) @@@ ...``) resolve to
the aliased expression field in the reference planner; the engine's DSL
addresses that field by its alias name, which is the same index field.
The CASE-expression-RHS sequential-scan fallback is an operator-RHS
planner path with no DSL analog (the DSL query is always a literal).
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

RUNNING_SHOES = {3, 4, 5}          # operators.out @@@/|||/===
FOOTWEAR = {3, 4, 5, 13, 23, 33}   # operators.out category sections


@pytest.fixture(scope="module")
def op_index(spark):
    # operators.out CREATE INDEX: description and category with the
    # default tokenizer, plus (lower(description)::pdb.simple) aliased
    # to description_lower
    docs = mock_items(spark).cache()
    schema = IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description"),
            FieldConfig(name="description_lower",
                        source="lower(description)", tokenizer="simple"),
            FieldConfig(name="category"),
        ])
    return build_index(docs, schema)


def _ids(idx, q):
    return {r["doc_id"] for r in
            compile_query(idx, q).select("doc_id").collect()}


# -- @@@ (parse) ------------------------------------------------------

@pytest.mark.parametrize("field", ["description", "description_lower"])
def test_parse(op_index, field):
    assert _ids(op_index, ast.Parse("running shoes", field=field)) \
        == RUNNING_SHOES


# -- &&& / ||| (match conjunction / disjunction) ----------------------

@pytest.mark.parametrize("field", ["description", "description_lower"])
def test_match_conjunction(op_index, field):
    q = ast.Match(field, "running shoes", conjunction_mode=True)
    assert _ids(op_index, q) == {3}


@pytest.mark.parametrize("field", ["description", "description_lower"])
def test_match_disjunction(op_index, field):
    q = ast.Match(field, "running shoes")
    assert _ids(op_index, q) == RUNNING_SHOES


# -- ### (phrase; string operand analyzed by the field tokenizer) -----

@pytest.mark.parametrize("field", ["description", "description_lower"])
def test_phrase(op_index, field):
    q = ast.Phrase(field, ["running", "shoes"])
    assert _ids(op_index, q) == {3}


# -- === (term / termset; needles are RAW) ----------------------------

def test_term_equality(op_index):
    assert _ids(op_index, ast.Term("description", "shoes")) \
        == RUNNING_SHOES
    # raw semantics: the index holds lowercased tokens, an unlowercased
    # needle matches nothing (same pinning as citext.out test 5)
    assert _ids(op_index, ast.Term("description", "SHOES")) == set()


def test_termset_equality(op_index):
    q = ast.TermSet("description", ["shoes", "SHOES"])
    assert _ids(op_index, q) == RUNNING_SHOES


# -- all five operators over a default-tokenized category field -------

def test_category_all_operators(op_index):
    for q in (ast.Parse("footwear", field="category"),
              ast.Match("category", "footwear", conjunction_mode=True),
              ast.Match("category", "footwear"),
              ast.Phrase("category", ["footwear"]),
              ast.Term("category", "footwear")):
        assert _ids(op_index, q) == FOOTWEAR, q
    # 'Footwear' raw needle misses the lowercased index tokens
    assert _ids(op_index, ast.Term("category", "Footwear")) == set()


# -- unsupported LHS types error (operators.out tail) -----------------

@pytest.mark.parametrize("field,dtype", [
    ("rating", "int"), ("in_stock", "boolean")])
def test_match_incompatible_lhs(op_index, field, dtype):
    with pytest.raises(TypeError, match=rf"type `{dtype}` is not "
                                        r"compatible with the `&&&`"):
        compile_query(op_index,
                      ast.Match(field, "42", conjunction_mode=True))
    with pytest.raises(TypeError, match=r"not compatible with the `\|\|\|`"):
        compile_query(op_index, ast.Match(field, "42"))


def test_phrase_incompatible_lhs(op_index):
    with pytest.raises(TypeError, match=r"type `int` is not compatible "
                                        r"with the `###`"):
        compile_query(op_index, ast.Phrase("rating", ["4"]))


def test_unknown_field_still_keyerror(op_index):
    # a name that is neither an index field nor a docs column keeps the
    # plain unknown-field error, not the operator-compat one
    with pytest.raises(KeyError, match="no_such"):
        compile_query(op_index, ast.Match("no_such", "x"))
