"""PG range-type column predicates (pdb_query.rs:274-312; deliveries
fixture analog tests/src/fixtures/tables/deliveries.rs)."""

import pytest
from pyspark.sql import functions as F, types as T

from sparksearch.index import build_index
from sparksearch.query import ast
from sparksearch.query.ast import RangeValue
from sparksearch.query.compiler import compile_query
from sparksearch.schema import FieldConfig, IndexSchema

RANGE_T = T.StructType([
    T.StructField("lower", T.IntegerType()),
    T.StructField("upper", T.IntegerType()),
    T.StructField("lower_inclusive", T.BooleanType()),
    T.StructField("upper_inclusive", T.BooleanType()),
])


@pytest.fixture(scope="module")
def deliveries(spark):
    rows = [
        (1, "fast parcel", (1, 10, True, False)),     # [1,10)
        (2, "slow freight", (5, 20, True, False)),    # [5,20)
        (3, "open ended", (15, None, True, False)),   # [15,∞)
        (4, "tiny", (3, 4, True, True)),              # [3,4]
        (5, "unbounded below", (None, 8, True, False)),  # (-∞,8)
        (6, "no range", None),
    ]
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("description", T.StringType()),
        T.StructField("weight_range", RANGE_T),
    ])
    docs = spark.createDataFrame(rows, schema)
    idx_schema = IndexSchema(key_field="id",
                             text_fields=[FieldConfig(name="description")])
    return build_index(docs, idx_schema)


def _ids(idx, q):
    return sorted(r["doc_id"] for r in compile_query(idx, q).collect())


def test_range_term_point(deliveries):
    assert _ids(deliveries, ast.RangeTerm("weight_range", 5)) == [1, 2, 5]
    assert _ids(deliveries, ast.RangeTerm("weight_range", 10)) == [2]   # [1,10) excl
    assert _ids(deliveries, ast.RangeTerm("weight_range", 4)) == [1, 4, 5]
    assert _ids(deliveries, ast.RangeTerm("weight_range", 1000)) == [3]


def test_range_contains(deliveries):
    q = ast.RangeContains("weight_range", RangeValue(6, 8))
    assert _ids(deliveries, q) == [1, 2, 5]   # (-∞,8) ⊇ [6,8) too
    q2 = ast.RangeContains("weight_range", RangeValue(15, None))
    assert _ids(deliveries, q2) == [3]
    # exact same range contains itself
    q3 = ast.RangeContains("weight_range", RangeValue(3, 4, True, True))
    assert 4 in _ids(deliveries, q3)


def test_range_within(deliveries):
    q = ast.RangeWithin("weight_range", RangeValue(0, 25))
    assert _ids(deliveries, q) == [1, 2, 4]
    q2 = ast.RangeWithin("weight_range", RangeValue(None, None))
    assert _ids(deliveries, q2) == [1, 2, 3, 4, 5]


def test_range_intersects(deliveries):
    q = ast.RangeIntersects("weight_range", RangeValue(9, 16))
    assert _ids(deliveries, q) == [1, 2, 3]
    q2 = ast.RangeIntersects("weight_range", RangeValue(10, 15))  # [10,15)
    assert _ids(deliveries, q2) == [2]  # 1 ends before 10 (excl); 3 starts at 15
    q3 = ast.RangeIntersects("weight_range", RangeValue(3, 4, True, True))
    assert _ids(deliveries, q3) == [1, 4, 5]


def test_range_combined_with_search(deliveries):
    q = ast.Boolean(must=[ast.Term("description", "parcel"),
                          ast.RangeTerm("weight_range", 5)])
    assert _ids(deliveries, q) == [1]


# -- ltree hierarchy ops (customscan/pushdown.rs:36-122) -------------------

@pytest.fixture(scope="module")
def ltree_docs(spark):
    rows = [
        (1, "root science", "Top.Science"),
        (2, "astro", "Top.Science.Astronomy"),
        (3, "astrophysics", "Top.Science.Astronomy.Astrophysics"),
        (4, "cosmology", "Top.Science.Astronomy.Cosmology"),
        (5, "hobbies", "Top.Hobbies"),
        (6, "prefix trap", "Top.ScienceFiction"),  # NOT under Top.Science
        (7, "top itself", "Top"),
    ]
    docs = spark.createDataFrame(rows, "id int, description string, path string")
    idx_schema = IndexSchema(key_field="id",
                             text_fields=[FieldConfig(name="description")])
    return build_index(docs, idx_schema)


def test_ltree_descendant(ltree_docs):
    """path <@ 'Top.Science' — descendant-or-self; the dotted-boundary
    check must exclude 'Top.ScienceFiction' (pushdown.rs:36-49)."""
    q = ast.LtreeDescendant("path", "Top.Science")
    assert _ids(ltree_docs, q) == [1, 2, 3, 4]


def test_ltree_ancestor(ltree_docs):
    """path @> 'Top.Science.Astronomy' — ancestor-or-self."""
    q = ast.LtreeAncestor("path", "Top.Science.Astronomy")
    assert _ids(ltree_docs, q) == [1, 2, 7]


def test_ltree_combined_with_search(ltree_docs):
    q = ast.Boolean(must=[ast.Term("description", "astro"),
                          ast.LtreeDescendant("path", "Top.Science")])
    assert _ids(ltree_docs, q) == [2]
