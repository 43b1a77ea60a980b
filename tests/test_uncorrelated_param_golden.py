"""uncorrelated-param-solving.out golden (PUBLIC reference behavior,
table replicated inline): keyset pagination whose cursor comes from
uncorrelated scalar subqueries (the created_at of row '4') composed
with ``status @@@ 'IN [posted pending]'`` — the page after row 4 in
(created_at DESC, id DESC) order is rows 3, 2, 1.

Ref: pg_search/tests/pg_regress/expected/uncorrelated-param-solving.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.parser import parse_query


@pytest.fixture(scope="module")
def items(spark):
    docs = (spark.createDataFrame(
        [("4", "g1", "posted", "2025-01-01 12:00:00"),
         ("3", "g1", "pending", "2025-01-01 12:00:00"),
         ("2", "g1", "posted", "2025-01-01 11:00:00"),
         ("1", "g1", "pending", "2025-01-01 10:00:00")],
        "id string, group_id string, status string, ts string")
        .withColumn("created_at", F.to_timestamp("ts")).drop("ts"))
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="group_id", tokenizer="keyword"),
                     FieldConfig(name="status", tokenizer="keyword")]))
    return idx, docs


def test_keyset_page_after_cursor_row(items):
    idx, docs = items
    q = ast.Boolean(must=[
        ast.Term("group_id", "g1"),
        ast.All(),
        parse_query("IN [posted pending]", default_field="status",
                    index_schema=idx.schema)])
    m = compile_query(idx, q).select("doc_id")
    d = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
    # uncorrelated scalar subquery: created_at of id='4' — an initplan
    # the executor evaluates once; the DataFrame analog is a broadcast
    # single-row cross join (no driver-side collect in the plan)
    cursor = (docs.filter(F.col("id") == "4")
              .select(F.col("created_at").alias("cur")))
    page = (d.crossJoin(F.broadcast(cursor))
            .filter((F.col("created_at") <= F.col("cur"))
                    & ((F.col("created_at") < F.col("cur"))
                       | ((F.col("id") < "4")
                          & (F.col("created_at") == F.col("cur")))))
            .orderBy(F.col("created_at").desc(), F.col("id").desc())
            .limit(100)
            .select("id", "status", "created_at"))
    rows = page.collect()
    assert [(r["id"], r["status"], str(r["created_at"])) for r in rows] \
        == [("3", "pending", "2025-01-01 12:00:00"),
            ("2", "posted", "2025-01-01 11:00:00"),
            ("1", "pending", "2025-01-01 10:00:00")]
