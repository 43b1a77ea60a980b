"""joinscan-subquery-parallel-rti.out golden (PUBLIC reference
behavior): EXISTS (semi) + NOT IN (anti, from a DISTINCT subquery with
an ``=== ARRAY['Marketo']`` term) around one search predicate, TopK id
DESC LIMIT 10 over 100k items / 1M people / 5k exclusions — the
reference bug made parallel workers open the wrong index's segments;
the portable invariant is the result page: the top even ids
100000..99982 (software docs are even; exclusions are multiples of 3
up to 15000, far below the page).

Ref: pg_search/tests/pg_regress/expected/joinscan-subquery-parallel-rti.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def test_semi_plus_anti_subquery_topk(spark):
    i = F.col("id")
    items = spark.range(1, 100_001).select(
        i.alias("id"), (i % 10).alias("category_id"),
        F.when(i % 2 == 0, "software platform")
        .otherwise("hardware device").alias("overview"))
    people = spark.range(1, 1_000_001).select(
        i.alias("id"), (i % 100_000 + 1).alias("company_id"))
    excluded = spark.range(1, 5_001).select(
        i.alias("id"), (i * 3).alias("company_id"),
        F.lit("Marketo").alias("technology_name"))

    i_idx = build_index(items, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="overview")],
        numeric_fields=["category_id"]))
    e_idx = build_index(excluded, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="technology_name",
                                 tokenizer="keyword")],
        numeric_fields=["company_id"]))

    sw = items.join(
        compile_query(i_idx, ast.Parse("software", field="overview"))
        .select("doc_id"), items["id"] == F.col("doc_id"), "left_semi")
    # NOT IN (SELECT DISTINCT company_id WHERE all() AND === 'Marketo')
    em = compile_query(e_idx, ast.Boolean(
        must=[ast.All(), ast.TermSet("technology_name", ["Marketo"])])) \
        .select("doc_id")
    excl_ids = (excluded.join(em, excluded["id"] == em["doc_id"],
                              "left_semi")
                .select("company_id").distinct())
    anti = sw.join(excl_ids, sw["id"] == excl_ids["company_id"],
                   "left_anti")
    # EXISTS (people.company_id = items.id)
    semi = anti.join(people.select(F.col("company_id").alias("pc"))
                     .distinct(),
                     anti["id"] == F.col("pc"), "left_semi")
    got = [r["id"] for r in
           semi.select("id").orderBy(F.col("id").desc())
           .limit(10).collect()]
    assert got == [100000, 99998, 99996, 99994, 99992,
                   99990, 99988, 99986, 99984, 99982]
