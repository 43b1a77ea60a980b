"""issue_4906_ltree_desc_op_pushdown.out golden (PUBLIC reference
behavior): ltree ``<@`` (descendant-or-equal) pushdown is LABEL-BOUNDARY
hierarchy semantics, never string-prefix — for ancestor Top.Science:
Top.Science.Biology and Top.Science itself match; Top.ScienceX,
Top.Science_Biology, Top.Science2, Topical/Other.Top.Science and the
case-variant top.Science do NOT; NULL never matches; and ``<@`` is
equivalent to the @@@ facet-term path on the same ltree field.

Ref: pg_search/tests/pg_regress/expected/issue_4906_ltree_desc_op_pushdown.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [
    (1, "Top", "root"),
    (2, "Top.Science", "science root"),
    (3, "Top.Science.Astronomy", "astronomy"),
    (4, "Top.Science.Astronomy.Astrophysics", "astrophysics"),
    (5, "Top.Science.Astronomy.Cosmology", "cosmology"),
    (6, "Top.Science.Biology", "biology"),
    (7, "Top.ScienceX", "string prefix trap sciencex"),
    (8, "Top.Science_Biology", "underscore sibling trap"),
    (9, "Top.Science2", "numeric suffix sibling trap"),
    (10, "Top.Sports", "sports"),
    (11, "Top.Collections.Pictures.Astronomy", "collection astronomy"),
    (12, "Other.Top.Science", "contains top science but not under top"),
    (13, "top.Science", "case-sensitive top"),
    (14, "Top.Science.AstronomyStars", "astronomystars sibling of astronomy"),
    (15, "Top.Science.Astronomy.Stars", "stars"),
    (16, "Top.Science.Astronomy.Galaxies", "galaxies"),
    (17, "Top.Science.Astronomy.Astrophysics.Cluster", "cluster"),
    (18, "Top.Science.Astronauts", "astronauts"),
    (19, None, "null category"),
]


@pytest.fixture(scope="module")
def ltree_idx(spark):
    docs = spark.createDataFrame(ROWS, "id long, category string, "
                                       "title string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="category", field_type="ltree"),
                     FieldConfig(name="title")]))
    return idx


def _ids(idx, q):
    return sorted(r["doc_id"]
                  for r in compile_query(idx, q).select("doc_id").collect())


def test_3_descendants_of_top_science(ltree_idx):
    assert _ids(ltree_idx, ast.LtreeDescendant("category", "Top.Science")) \
        == [2, 3, 4, 5, 6, 14, 15, 16, 17, 18]


def test_5_facet_term_path_equivalent(ltree_idx):
    """`category @@@ 'Top.Science'` (Term over an ltree field) is the
    same descendant-or-self match set as `<@`."""
    assert _ids(ltree_idx, ast.Term("category", "Top.Science")) == \
        _ids(ltree_idx, ast.LtreeDescendant("category", "Top.Science"))


def test_6_deep_ancestor_sibling_label_excluded(ltree_idx):
    """Top.Science.AstronomyStars is a SIBLING label of Astronomy, not a
    descendant."""
    assert _ids(ltree_idx,
                ast.LtreeDescendant("category", "Top.Science.Astronomy")) \
        == [3, 4, 5, 15, 16, 17]


def test_7_equality_is_included(ltree_idx):
    got = _ids(ltree_idx, ast.Boolean(must=[
        ast.LtreeDescendant("category", "Top.Science"),
        ast.HeapFilter(ast.All(), "category = 'Top.Science'")]))
    assert got == [2]


def test_8_string_prefix_traps_excluded(ltree_idx):
    traps = {7, 8, 9, 10, 11, 12, 13}
    got = set(_ids(ltree_idx,
                   ast.LtreeDescendant("category", "Top.Science")))
    assert got & traps == set()


def test_9_top_level_ancestor(ltree_idx):
    """Descendants of Top: everything whose FIRST label is exactly Top —
    not Other.Top.Science, not case-variant top.Science, not NULL."""
    assert _ids(ltree_idx, ast.LtreeDescendant("category", "Top")) == \
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 14, 15, 16, 17, 18]


def test_10_no_match_stays_empty(ltree_idx):
    assert _ids(ltree_idx, ast.LtreeDescendant(
        "category", "Top.Science.Astronomy.Deep")) == []


def test_11_composes_with_heap_filter(ltree_idx):
    got = _ids(ltree_idx, ast.Boolean(must=[
        ast.LtreeDescendant("category", "Top.Science"),
        ast.HeapFilter(ast.All(), "(id + 0) >= 15")]))
    assert got == [15, 16, 17, 18]
