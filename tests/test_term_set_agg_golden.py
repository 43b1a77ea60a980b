"""term_set_agg.out golden (PUBLIC reference behavior): a TermSet built
from another index's search results — the build-side CTE pattern

    WITH genus_terms AS (SELECT pdb.term_set(id) FROM genus
                         WHERE genus.name @@@ 'oak')
    SELECT ... FROM plants WHERE plants.genus_id @@@ genus_terms.terms

The inner search's keys become a constant-score IN-list over the outer
table's numeric fast field (at scale, the same build-side IN-list
pushdown the scored-join contract entries use). Also ports the
value_count aggregate envelope and the empty-build-side case.
Ref: pg_search/tests/pg_regress/expected/term_set_agg.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import run_aggs
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

GENUS = [(0, "oak"), (1, "maple"), (2, "pine"), (3, "apple")]
PLANTS = [
    (1, 0, "English Oak"), (2, 0, "Holly Oak"), (3, 0, "White Oak"),
    (4, 1, "Sugar Maple"), (5, 1, "Red Maple"), (6, 1, "Norway Maple"),
    (7, 2, "Scots Pine"), (8, 2, "Ponderosa Pine"),
    (9, 3, "Domestic Apple"), (10, 3, "Siberian Crabapple"),
]


@pytest.fixture(scope="module")
def indexes(spark):
    genus = spark.createDataFrame(GENUS, "id long, name string")
    plants = spark.createDataFrame(PLANTS,
                                   "id long, genus_id long, name string")
    g_idx = build_index(genus, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    p_idx = build_index(plants, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="name")]))
    return g_idx, p_idx, plants


def _term_set_of_search(g_idx, needle):
    """The CTE: search genus, collect keys as a TermSet."""
    keys = [r["doc_id"] for r in
            compile_query(g_idx, ast.Term("name", needle)).collect()]
    return ast.TermSet("genus_id", keys)


def test_termset_from_search_results(indexes):
    # Test 1 — plants of the 'oak' genus, ordered by id
    g_idx, p_idx, plants = indexes
    ts = _term_set_of_search(g_idx, "oak")
    got = (compile_query(p_idx, ts)
           .join(plants.withColumnRenamed("id", "doc_id"), "doc_id")
           .orderBy("doc_id").select("doc_id", "name").collect())
    assert [(r["doc_id"], r["name"]) for r in got] == \
        [(1, "English Oak"), (2, "Holly Oak"), (3, "White Oak")]


def test_termset_value_count_agg(indexes):
    # Test 2 — {"count": {"value_count": {"field": "genus_id"}}} → 3.0
    g_idx, p_idx, plants = indexes
    ts = _term_set_of_search(g_idx, "oak")
    matches = compile_query(p_idx, ts).join(
        plants.withColumnRenamed("id", "doc_id"), "doc_id")
    out = run_aggs(matches, {"count": {"value_count":
                                       {"field": "genus_id"}}})
    got = out["aggregations"]["count"]["value"]
    assert got == 3.0 and isinstance(got, float)


def test_termset_empty_build_side(indexes):
    # Test 3 — no genus matches 'bamboo' → no plants
    g_idx, p_idx, _ = indexes
    ts = _term_set_of_search(g_idx, "bamboo")
    assert compile_query(p_idx, ts).count() == 0
