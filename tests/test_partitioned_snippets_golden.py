"""partitioned_snippets.out golden (PUBLIC reference behavior, table
replicated inline): ``pdb.snippets`` (multi-fragment array) over a
RANGE-partitioned table — the parent query merges per-partition TopK
scans (Spark analog: one partitioned index, TakeOrderedAndProject over
the pruned scan), UNNEST explodes fragments before LIMIT/OFFSET, and
LIMIT 0 returns nothing.

Divergence, deliberate: the reference ERRORs on UNNEST over the
PARENT table and on multiple SRFs ("Unsupported query shape", tests
2/6) — planner limitations of its custom scan, not semantics.  Spark's
explode has no such restriction, so this engine returns the correct
rows for those shapes too; we pin our (strictly wider) behavior.

Ref: pg_search/tests/pg_regress/expected/partitioned_snippets.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippets
from sparksearch.query import ast, search

LOGS = [
    (1, "The research team from Canada discovered a new species of "
        "deep-sea creature. This research is groundbreaking.",
     "Canada", "2020-06-01 12:00:00"),
    (2, "In Canada, research on climate change continues. This research "
        "will help us understand our planet.",
     "Canada", "2020-11-20 08:00:00"),
    (3, "The research institute in Germany developed a new system. "
        "Further research is needed.",
     "Germany", "2021-07-15 10:00:00"),
    (4, "A joint research project between Canada and Germany is "
        "underway. The research is focused on renewable energy.",
     "Canada", "2021-03-10 14:00:00"),
    (5, "Canadian research shows new findings. More research is planned.",
     "Canada", "2020-02-01 00:00:00"),
    (6, "German research leads to a breakthrough. This research is "
        "important.",
     "Germany", "2021-09-01 00:00:00"),
]

QUERY = ast.Boolean(must=[ast.Parse("research", field="message"),
                          ast.Parse("Canada", field="country")])


@pytest.fixture(scope="module")
def logs_index(spark):
    docs = (spark.createDataFrame(
        LOGS, "id long, message string, country string, ts_str string")
        .withColumn("timestamp", F.to_timestamp("ts_str"))
        .withColumn("year", F.year("timestamp")).drop("ts_str"))
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="message"),
                     FieldConfig(name="country", tokenizer="keyword")],
        partition_by="year"))
    return idx


def _snippet_hits(idx, query=QUERY, year=None):
    q = query
    if year is not None:
        # child-table scan: the partition-column filter prunes to one
        # partition directory (the reference queries logs_2020 directly)
        q = ast.HeapFilter(query=query, predicate=f"year = {year}")
    hits = search(idx, q, order_by=[("id", "asc")], with_score=False,
                  columns=["id", "message"])
    return with_snippets(idx, hits, query, "message", max_chars=25)


def test_parent_snippets_no_unnest(logs_index):
    # Test 1: snippets arrays on the parent, ORDER BY id LIMIT 3
    rows = (_snippet_hits(logs_index).orderBy("id").limit(3)
            .select("id", "snippets").collect())
    assert [(r[0], list(r[1])) for r in rows] == [
        (1, ["The <b>research</b> team from",
             "creature. This <b>research</b>"]),
        (2, ["In Canada, <b>research</b> on",
             "This <b>research</b> will help"]),
        (4, ["A joint <b>research</b> project",
             "<b>research</b> is focused on"]),
    ]


def test_parent_unnest_supported_here(logs_index):
    # Test 2 diverges: reference errors on UNNEST over the parent; this
    # engine explodes fine — first 3 exploded rows in id order
    rows = (_snippet_hits(logs_index)
            .select("id", F.posexplode("snippets").alias("pos", "snippet"))
            .orderBy("id", "pos").limit(3).collect())
    assert [(r["id"], r["snippet"]) for r in rows] == [
        (1, "The <b>research</b> team from"),
        (1, "creature. This <b>research</b>"),
        (2, "In Canada, <b>research</b> on")]


def test_child_unnest(logs_index):
    # Test 3: UNNEST on the 2020 child -> ids 1,2,5 match; LIMIT 3
    rows = (_snippet_hits(logs_index, year=2020)
            .select("id", F.posexplode("snippets").alias("pos", "snippet"))
            .orderBy("id", "pos").limit(3).collect())
    assert [(r["id"], r["snippet"]) for r in rows] == [
        (1, "The <b>research</b> team from"),
        (1, "creature. This <b>research</b>"),
        (2, "In Canada, <b>research</b> on")]


def test_child_unnest_offset(logs_index):
    # Test 4: LIMIT 2 OFFSET 1 over the exploded rows
    rows = (_snippet_hits(logs_index, year=2020)
            .select("id", F.posexplode("snippets").alias("pos", "snippet"))
            .orderBy("id", "pos").collect())[1:3]
    assert [(r["id"], r["snippet"]) for r in rows] == [
        (1, "creature. This <b>research</b>"),
        (2, "In Canada, <b>research</b> on")]


def test_child_unnest_limit_zero(logs_index):
    # Test 5: LIMIT 0 -> zero rows
    rows = (_snippet_hits(logs_index, year=2020)
            .select("id", F.posexplode("snippets").alias("pos", "snippet"))
            .orderBy("id", "pos").limit(0).collect())
    assert rows == []


def test_multiple_srfs_supported_here(logs_index):
    # Test 6 diverges: reference errors on a second SRF; Spark composes
    # explode + a generated series freely
    rows = (_snippet_hits(logs_index, year=2020)
            .select("id", F.posexplode("snippets").alias("pos", "snippet"))
            .crossJoin(F.broadcast(
                logs_index.docs.sparkSession.range(1, 3)
                .withColumnRenamed("id", "n")))
            .orderBy("id", "pos", "n").limit(3).collect())
    assert [(r["id"], r["n"]) for r in rows] == [(1, 1), (1, 2), (1, 1)]
