"""issue_3196.out + issue_3050.out goldens (PUBLIC reference behavior,
mock_items + two all-NULL rows): which SQL COUNT arguments ride the
index aggregate scan, and what the results are either way.

- COUNT(*) → value_count over the key (ctid analog) = 43
- COUNT(rating) → value_count(rating) = 41 (NULLs don't count)
- COUNT(metadata->>'color') → NOT pushable ("argument to aggregate
  function is neither a direct column reference nor a COALESCE
  expression" warning), heap fallback = 41
- COUNT(COALESCE(rating, 0)) → value_count with missing=0.0 = 43
- COUNT(COALESCE(metadata->>'color', 'red')) → NOT pushable ("first
  argument of COALESCE must resolve to a variable"), fallback = 43

issue_3050: GROUP BY id, rating — the PK makes rating functionally
dependent, Postgres drops it from the grouping set, and the target
list check warns ``Field 'rating' is not a grouping column`` (plain
groupBy fallback returns the same rows); GROUP BY id,
metadata->>'color' keeps the JSON expression and stays on the
aggregate scan.

Ref: pg_search/tests/pg_regress/expected/{issue_3196,issue_3050}.out
"""

import warnings

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import (check_grouped_targets, count_aggregate_spec,
                              grouping_columns, search_aggregate)
from sparksearch.fixtures import mock_items
from sparksearch.query import ast


@pytest.fixture(scope="module")
def idx43(spark):
    base = mock_items(spark)
    nulls = spark.createDataFrame(
        [(42,), (43,)], "id long").select(
        "id", *[F.lit(None).cast(dict(base.dtypes)[c]).alias(c)
                for c in base.columns if c != "id"])
    docs = base.unionByName(nulls.select(*base.columns))
    return build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[
            FieldConfig(name="description"),
            FieldConfig(name="category", tokenizer="keyword"),
            FieldConfig(name="metadata", tokenizer="json",
                        tokenizer_opts={"value_tokenizer": "raw"},
                        lowercase=True)],
        numeric_fields=["rating"]))


def _count(idx, spec):
    res = search_aggregate(idx, ast.All(), {"0": spec})
    return res["aggregations"]["0"]["value"]


def test_count_star(idx43):
    spec = count_aggregate_spec(idx43, "*")
    assert spec == {"value_count": {"field": "id"}}
    assert _count(idx43, spec) == 43.0


def test_count_column_skips_nulls(idx43):
    spec = count_aggregate_spec(idx43, "rating")
    assert spec == {"value_count": {"field": "rating"}}
    assert _count(idx43, spec) == 41.0


def test_count_json_projection_falls_back(idx43):
    with pytest.warns(UserWarning,
                      match=r"Aggregate Scan not used: argument to "
                            r"aggregate function is neither a direct "
                            r"column reference nor a COALESCE"):
        spec = count_aggregate_spec(idx43, "metadata->>'color'")
    assert spec is None
    # heap fallback computes the same answer the golden pins
    got = idx43.docs.agg(F.count(
        F.get_json_object("metadata", "$.color")).alias("c")).first()["c"]
    assert got == 41


def test_count_coalesce_pushes_missing(idx43):
    spec = count_aggregate_spec(idx43, "COALESCE(rating, 0)")
    assert spec == {"value_count": {"field": "rating", "missing": 0.0}}
    assert _count(idx43, spec) == 43.0


def test_count_coalesce_expression_falls_back(idx43):
    with pytest.warns(UserWarning,
                      match=r"first argument of COALESCE must resolve "
                            r"to a variable"):
        spec = count_aggregate_spec(idx43,
                                    "COALESCE(metadata->>'color', 'red')")
    assert spec is None
    got = idx43.docs.agg(F.count(F.coalesce(
        F.get_json_object("metadata", "$.color"),
        F.lit("red"))).alias("c")).first()["c"]
    assert got == 43


def test_coalesce_non_constant_default_falls_back(idx43):
    with pytest.warns(UserWarning,
                      match=r"second argument of COALESCE must resolve "
                            r"to a constant"):
        assert count_aggregate_spec(idx43,
                                    "COALESCE(rating, category)") is None


def test_check_aggregate_scan_guc_silences(idx43):
    import sparksearch.config as cfg
    cfg.set(check_aggregate_scan=False)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert count_aggregate_spec(idx43, "upper(category)") is None
    finally:
        cfg.set(check_aggregate_scan=True)


# --- issue_3050: grouping-column functional-dependency check ----------------

def test_pk_drops_plain_columns_from_grouping(idx43):
    assert grouping_columns(idx43, ["id", "rating"]) == ["id"]
    with pytest.warns(UserWarning,
                      match=r"Field 'rating' is not a grouping column"):
        assert not check_grouped_targets(idx43, ["id", "rating"],
                                         ["id", "rating"])


def test_json_expression_survives_grouping(idx43):
    assert grouping_columns(idx43, ["id", "metadata.color"]) == \
        ["id", "metadata.color"]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert check_grouped_targets(idx43, ["id", "metadata.color"],
                                     ["id", "metadata.color"])


def test_group_by_results_match_either_path(idx43):
    """The golden's LIMIT 5 pages — identical on both plans."""
    got = (idx43.docs.groupBy("id", "rating").count()
           .orderBy("id", "rating").limit(5).collect())
    assert [(r["id"], r["rating"], r["count"]) for r in got] == \
        [(1, 4, 1), (2, 4, 1), (3, 5, 1), (4, 3, 1), (5, 4, 1)]
    got = (idx43.docs
           .withColumn("color", F.get_json_object("metadata", "$.color"))
           .groupBy("id", "color").count()
           .orderBy("id", "color").limit(5).collect())
    assert [(r["id"], r["color"], r["count"]) for r in got] == \
        [(1, "Silver", 1), (2, "Black", 1), (3, "Blue", 1),
         (4, "White", 1), (5, "Brown", 1)]
