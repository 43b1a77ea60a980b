"""join_orderby_expression.out golden (PUBLIC reference behavior,
tables replicated inline — issue #4754): ORDER BY expressions that are
order-preserving wrappers around a bare column (id + 0, id - 0,
id * 1, id / 1, big_id variants) all produce the same TopK result as
the bare column over a search-filtered IN-subquery join.

Ref: pg_search/tests/pg_regress/expected/join_orderby_expression.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

COMPANIES = [
    (1, "TechStartup", "A technology startup building innovative solutions"),
    (2, "DataCorp", "Data analytics and machine learning company"),
    (3, "CloudNet", "Cloud networking and infrastructure provider"),
    (4, "AIVentures", "Artificial intelligence research and development"),
    (5, "WebScale", "Web-scale distributed systems company"),
]
ROUNDS = [(101, 1, "seed"), (102, 1, "series_a"), (103, 2, "seed"),
          (104, 3, "series_b"), (105, 4, "seed"), (106, 5, "series_a")]


@pytest.fixture(scope="module")
def funding(spark):
    companies = (spark.createDataFrame(
        COMPANIES, "id long, name string, description string")
        .withColumn("big_id", F.col("id")))
    rounds = spark.createDataFrame(
        ROUNDS, "id long, company_id long, round_type string")
    cidx = build_index(companies, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="description")]))
    ridx = build_index(rounds, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="round_type", tokenizer="keyword")]))
    return cidx, ridx, companies, rounds


WRAPPERS = ["id", "id + 0", "id - 0", "id * 1", "id / 1",
            "big_id", "big_id + 0", "0 + id"]


def test_order_preserving_wrappers(funding):
    cidx, ridx, companies, rounds = funding
    seed = compile_query(ridx, ast.Parse("seed", field="round_type")) \
        .select("doc_id")
    seed_companies = (rounds.join(seed, rounds["id"] == seed["doc_id"],
                                  "left_semi")
                      .select("company_id").distinct())
    tech = compile_query(cidx, ast.Parse("technology",
                                         field="description")) \
        .select(F.col("doc_id").alias("cid"))
    base = (companies
            .join(seed_companies,
                  companies["id"] == seed_companies["company_id"],
                  "left_semi")
            .join(tech, companies["id"] == F.col("cid"), "left_semi"))
    for w in WRAPPERS:
        rows = (base.orderBy(F.expr(w).desc()).limit(10)
                .select("id", "name").collect())
        assert [(r[0], r[1]) for r in rows] == [(1, "TechStartup")], w
