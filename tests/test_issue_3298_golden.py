"""issue_3298.out golden (PUBLIC reference behavior, mock_items +
allowed_categories build side): term_set whose terms come from a
SUBQUERY over another table (``ARRAY(SELECT paradedb.term('category',
category) FROM allowed_categories LIMIT ...)``) — as a plain WHERE
(count 5), and as TWO independent ``COUNT(*) FILTER`` aggregates over
one scan with different LIMIT/OFFSET slices of the build side (total
41, filter counts 5 and 0).  The golden re-runs both with the
aggregate custom scan off to pin that results don't depend on the
execution path; here both paths are one Catalyst plan, and the
match-flag recipe is the FILTER analog.

Ref: pg_search/tests/pg_regress/expected/issue_3298.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.fixtures import mock_items
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def cat_idx(spark):
    docs = mock_items(spark)
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description"),
                     FieldConfig(name="category", tokenizer="literal")]))
    allowed = spark.createDataFrame([("Electronics",), ("Clothing",)],
                                    "category string")
    return idx, docs, allowed


def _terms(allowed, limit, offset=0):
    # ARRAY(SELECT term(...) LIMIT n OFFSET m): build side collapses to
    # an IN-list on the driver (build-side IN-list pushdown); the dim
    # table is 2 rows, so the collect is bounded by construction
    rows = allowed.collect()[offset:offset + limit]
    return [r["category"] for r in rows]


def test_where_term_set_from_subquery(cat_idx):
    idx, _, allowed = cat_idx
    q = ast.TermSet("category", _terms(allowed, 5))
    assert compile_query(idx, q).count() == 5


def test_two_filter_aggregates_over_one_scan(cat_idx):
    idx, docs, allowed = cat_idx
    first = ast.TermSet("category", _terms(allowed, 2))
    second_terms = _terms(allowed, 2, offset=2)   # empty slice
    d = docs
    m1 = (compile_query(idx, first).select("doc_id")
          .withColumn("f1", F.lit(True)))
    d = (d.join(m1, d["id"] == m1["doc_id"], "left").drop("doc_id")
         .withColumn("f1", F.coalesce(F.col("f1"), F.lit(False))))
    if second_terms:
        m2 = (compile_query(idx, ast.TermSet("category", second_terms))
              .select("doc_id").withColumn("f2", F.lit(True)))
        d = (d.join(m2, d["id"] == m2["doc_id"], "left").drop("doc_id")
             .withColumn("f2", F.coalesce(F.col("f2"), F.lit(False))))
    else:
        # an EMPTY term set matches nothing (the golden's LIMIT 2
        # OFFSET 2 slice of a 2-row table)
        d = d.withColumn("f2", F.lit(False))
    r = d.agg(F.count("*").alias("total"),
              F.count(F.when(F.col("f1"), 1)).alias("c1"),
              F.count(F.when(F.col("f2"), 1)).alias("c2")).first()
    assert (r["total"], r["c1"], r["c2"]) == (41, 5, 0)


def test_empty_term_set_matches_nothing(cat_idx):
    idx, _, _ = cat_idx
    assert compile_query(idx, ast.TermSet("category", [])).count() == 0
