"""join_semi_anti_disjunctive_parallel.out golden (PUBLIC reference
behavior): semi/anti joins whose correlation is a DISJUNCTION across
columns — ``NOT EXISTS (... e.pattern = i.name OR e.pattern =
i.alt_name)`` and the 3-arm EXISTS variant — must return identical
rows however the join is executed.  4000 items (category 'target' on
even ids, alt_name on multiples of 3), exclusions 'name_i' (i%7=0,
i≤2000) and 'alt_i' (i%33=0): the anti set is 1802 rows topped by
4000..3982, the semi set is 198 rows from 14 up.  The engine runs the
OR-join both as a single disjunctive join condition and as the
union-of-arms rewrite (the reference's JoinScan absorption shape) and
they must agree row-for-row.

Ref: pg_search/tests/pg_regress/expected/
join_semi_anti_disjunctive_parallel.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def jsd(spark):
    i = F.col("id")
    items = spark.range(1, 4001).select(
        i.alias("id"),
        F.concat(F.lit("name_"), i.cast("string")).alias("name"),
        F.when(i % 3 == 0, F.concat(F.lit("alt_"), i.cast("string")))
        .otherwise(F.lit(None).cast("string")).alias("alt_name"),
        F.when(i % 2 == 0, "target").otherwise("other").alias("category"))
    name_pat = spark.range(1, 2001).filter(i % 7 == 0).select(
        F.concat(F.lit("name_"), i.cast("string")).alias("pattern"))
    alt_pat = spark.range(1, 4001).filter((i % 3 == 0) & (i % 11 == 0)) \
        .select(F.concat(F.lit("alt_"), i.cast("string"))
                .alias("pattern"))
    exclusions = name_pat.unionByName(alt_pat)
    idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword"),
                     FieldConfig(name="category", tokenizer="keyword")]))
    return items, exclusions, idx


def _target(jsd_fix):
    items, _, idx = jsd_fix
    m = compile_query(idx, ast.Parse('category:"target"',
                                     field="name")).select("doc_id")
    return items.join(m, items["id"] == F.col("doc_id"), "left_semi")


def test_anti_join_two_arm_or(jsd):
    items, exclusions, idx = jsd
    t = _target(jsd)
    # single disjunctive anti-join condition
    cond = (F.col("pattern") == t["name"]) | \
        (F.col("pattern") == t["alt_name"])
    anti = t.join(exclusions, cond, "left_anti")
    assert anti.count() == 1802
    top = [r["id"] for r in anti.select("id")
           .orderBy(F.col("id").desc()).limit(10).collect()]
    assert top == [4000, 3998, 3996, 3994, 3992,
                   3990, 3988, 3986, 3984, 3982]
    # union-of-arms rewrite: NOT(a OR b) = NOT a AND NOT b
    arms = (t.join(exclusions, t["name"] == F.col("pattern"),
                   "left_anti")
            .join(exclusions, F.col("alt_name") == F.col("pattern"),
                  "left_anti"))
    assert arms.count() == 1802
    assert anti.select("id").exceptAll(arms.select("id")).count() == 0
    assert arms.select("id").exceptAll(anti.select("id")).count() == 0


def test_semi_join_three_arm_or(jsd):
    items, exclusions, idx = jsd
    t = _target(jsd)
    cond = (F.col("pattern") == t["name"]) | \
        (F.col("pattern") == t["alt_name"]) | \
        (F.col("pattern") == t["category"])
    semi = t.join(exclusions, cond, "left_semi")
    assert semi.count() == 198
    first = [r["id"] for r in semi.select("id")
             .orderBy("id").limit(5).collect()]
    assert first == [14, 28, 42, 56, 66]
    # union-of-arms rewrite: EXISTS(a OR b OR c) = semi(a) ∪ semi(b) ∪ semi(c)
    arms = None
    for col in ("name", "alt_name", "category"):
        piece = t.join(exclusions, t[col] == F.col("pattern"),
                       "left_semi").select("id")
        arms = piece if arms is None else arms.unionByName(piece)
    arms = arms.distinct()
    assert arms.count() == 198
    assert semi.select("id").exceptAll(arms).count() == 0
