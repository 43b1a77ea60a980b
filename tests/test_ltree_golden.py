"""ltree.out golden (PUBLIC reference behavior, table replicated
inline): ltree columns index as Facet fields — ``@@@`` / ``term()``
over them is HIERARCHICAL descendant-or-self matching (the golden's
NOTE), sorting is lexicographic, an ltree can be the key field, and
``&&&`` errors (intentionally incompatible).

Ref: pg_search/tests/pg_regress/expected/ltree.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast, search
from sparksearch.query.compiler import compile_query

PATHS = ["Top.Science.Astronomy", "Top.Science.Biology",
         "Top.Science.Biology.Botany", "Top.Collections.Pictures",
         "Top.Collections.Pictures.Astronomy",
         "Top.Hobbies.Photography", None]


@pytest.fixture(scope="module")
def ltree_index(spark):
    docs = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(PATHS)],
        "id long, category string")
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", field_type="ltree")]))


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_at_at_at_exact_leaf(ltree_index):
    # category @@@ 'Top.Science.Astronomy' -> 1 row (no descendants)
    got = compile_query(ltree_index,
                        ast.Parse("Top.Science.Astronomy",
                                  field="category"))
    assert _ids(got) == [1]


def test_at_at_at_descendant_or_self_count(ltree_index):
    # 'Top.Science.Biology' matches itself AND .Botany -> count 2
    got = compile_query(ltree_index,
                        ast.Parse("Top.Science.Biology",
                                  field="category"))
    assert _ids(got) == [2, 3]


def test_order_by_ltree_lexicographic(ltree_index):
    rows = search(ltree_index, ast.All(),
                  order_by=[("category", "asc nulls last")],
                  columns=["id", "category"], with_score=False).collect()
    assert [r["id"] for r in rows] == [4, 5, 6, 1, 2, 3, 7]


def test_ltree_as_key_field(spark):
    docs = spark.createDataFrame(
        [("Root.Branch1", "First Branch"), ("Root.Branch2", "Second Branch")],
        "path string, name string")
    idx = build_index(docs, IndexSchema(
        key_field="path", text_fields=[FieldConfig(name="name")]))
    rows = search(idx, ast.Parse("Branch", field="name"),
                  order_by=[("path", "asc")],
                  columns=["path", "name"], with_score=False).collect()
    assert [(r[0], r[1]) for r in rows] == [
        ("Root.Branch1", "First Branch"),
        ("Root.Branch2", "Second Branch")]


def test_ampamp_on_ltree_errors(ltree_index):
    with pytest.raises(TypeError, match=r"type `ltree` is not compatible "
                                        r"with the `&&&` operator"):
        compile_query(ltree_index,
                      ast.Match("category", "Top.Science.Biology",
                                conjunction_mode=True))


def test_term_facet_branch(ltree_index):
    # paradedb.term(field => 'category', value => 'Top.Hobbies.Photography')
    got = compile_query(ltree_index,
                        ast.Term("category", "Top.Hobbies.Photography"))
    assert _ids(got) == [6]


def test_term_facet_matches_descendants(ltree_index):
    # facet term queries match the subtree, like the @@@ NOTE says
    got = compile_query(ltree_index,
                        ast.Term("category", "Top.Collections.Pictures"))
    assert _ids(got) == [4, 5]
