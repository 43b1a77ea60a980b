"""joinscan_notin_null_safety.out parity — NULL-poisoned NOT IN.

Oracle: /root/reference/pg_search/tests/pg_regress/expected/
joinscan_notin_null_safety.out.  Exact corpus: 100 outer rows (txt =
'match'), include-set vals 1..100, exclude-set vals 50..60 plus ONE NULL
row.  Pins, through the accelerated join path:

- test 1/2: ``id IN (include) AND id NOT IN (exclude) AND txt @@@
  'match'`` returns **0** rows — the inner NULL makes every NOT IN check
  UNKNOWN (three-valued logic), and the accelerated anti join must stay
  null-aware rather than degrade to NOT EXISTS (pre-fix bug: 89);
- test 3: the NOT EXISTS spelling of the same query returns **89**
  (NULLs never match an equi-predicate, UNKNOWN never propagates).

The engine composes the search match set with Spark SQL joins; Spark's
NOT IN lowers to a null-aware anti join natively — this pins that the
composed plan keeps that property.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def jnns(spark):
    items = spark.range(1, 101).select(
        F.col("id"), F.lit("match").alias("txt"))
    include = spark.range(1, 101).select(F.col("id").alias("val"))
    exclude = spark.createDataFrame(
        [(v,) for v in range(50, 61)] + [(None,)], "val long")
    idx = build_index(items, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="txt")]))
    matches = compile_query(idx, ast.Term("txt", "match")).select("doc_id")
    matches.createOrReplaceTempView("jnns_matches")
    include.createOrReplaceTempView("jnns_include_set")
    exclude.createOrReplaceTempView("jnns_exclude_set")
    return spark


def test_not_in_null_bomb_returns_zero(jnns):
    # joinscan_notin_null_safety.out tests 1+2: expected_zero = 0
    n = jnns.sql("""
        SELECT COUNT(*) AS joinscan_result FROM (
          SELECT doc_id FROM jnns_matches
          WHERE doc_id IN     (SELECT val FROM jnns_include_set)
            AND doc_id NOT IN (SELECT val FROM jnns_exclude_set)
          ORDER BY doc_id LIMIT 1000) sub
    """).collect()[0][0]
    assert n == 0


def test_not_exists_rewrite_returns_89(jnns):
    # test 3: NOT EXISTS is different SQL by design — 89 rows
    n = jnns.sql("""
        SELECT COUNT(*) AS notexists_result FROM (
          SELECT m.doc_id FROM jnns_matches m
          WHERE EXISTS     (SELECT 1 FROM jnns_include_set i
                            WHERE i.val = m.doc_id)
            AND NOT EXISTS (SELECT 1 FROM jnns_exclude_set e
                            WHERE e.val = m.doc_id)
          ORDER BY m.doc_id LIMIT 1000) sub
    """).collect()[0][0]
    assert n == 89


def test_not_in_without_null_equals_not_exists(jnns):
    # drop the NULL row: NOT IN and NOT EXISTS converge on 89
    n = jnns.sql("""
        SELECT COUNT(*) FROM jnns_matches
        WHERE doc_id IN     (SELECT val FROM jnns_include_set)
          AND doc_id NOT IN (SELECT val FROM jnns_exclude_set
                             WHERE val IS NOT NULL)
    """).collect()[0][0]
    assert n == 89
