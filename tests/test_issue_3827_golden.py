"""issue_3827.out golden (PUBLIC reference behavior, PG18 RTE_GROUP
regression): GROUP BY eligibility for the index aggregate scan and the
graceful fallbacks.

- GROUP BY n (declared numeric fast field) + window SUM(n) OVER () /
  COUNT(*) → rides the aggregate scan; results (n=1, sum 6 / count 1).
- GROUP BY txt (TOKENIZED text field) → ``grouping column txt exists,
  but is not a fast field`` warning, fallback returns 'foo'.
- GROUP BY not_indexed (column not in the index) → ``grouping column
  not_indexed is missing from index`` warning, fallback returns the
  three (not_indexed, count) rows.

Ref: pg_search/tests/pg_regress/expected/issue_3827.out
"""

import pytest
from pyspark.sql import Window as W, functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.aggs import check_grouping_columns, search_aggregate
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

ROWS = [(1, "foo", 1, 10), (2, "foo", 2, 20), (3, "foo", 3, 30)]


@pytest.fixture(scope="module")
def t3827(spark):
    docs = spark.createDataFrame(
        ROWS, "id long, txt string, n int, not_indexed int")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="txt")],
        numeric_fields=["n"]))
    return idx, docs


def test_group_by_fast_numeric_rides_agg_scan(t3827):
    idx, docs = t3827
    assert check_grouping_columns(idx, ["n"])
    res = search_aggregate(idx, ast.All(),
                           {"g": {"terms": {"field": "n",
                                            "order": {"_key": "asc"}}}})
    buckets = res["aggregations"]["g"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == \
        [(1, 1), (2, 1), (3, 1)]
    # Test 1's window agg over the match set: SUM(n) OVER () = 6
    m = compile_query(idx, ast.All()).select("doc_id")
    d = docs.join(m, docs["id"] == m["doc_id"], "left_semi")
    page = (d.groupBy("n").count()
            .withColumn("sum_n", F.sum(F.col("n")).over(W.partitionBy()))
            .orderBy("n").limit(1).collect())
    assert (page[0]["n"], page[0]["sum_n"]) == (1, 6)


def test_group_by_tokenized_text_warns(t3827):
    idx, docs = t3827
    with pytest.warns(UserWarning,
                      match=r"grouping column txt exists, but is not "
                            r"a fast field"):
        assert not check_grouping_columns(idx, ["txt"])
    # HAVING (txt @@@ 'foo') OR SUM(n) < 0 via the fallback plan
    m = compile_query(idx, ast.Parse("foo", field="txt")) \
        .select("doc_id").distinct()
    matched_txt = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
                   .select("txt").distinct())
    got = (docs.groupBy("txt").agg(F.sum("n").alias("s"))
           .join(matched_txt, "txt", "left_semi")
           .orderBy("txt").collect())
    assert [r["txt"] for r in got] == ["foo"]


def test_group_by_unindexed_column_warns_and_falls_back(t3827):
    idx, docs = t3827
    with pytest.warns(UserWarning,
                      match=r"grouping column not_indexed is missing "
                            r"from index"):
        assert not check_grouping_columns(idx, ["not_indexed"])
    m = compile_query(idx, ast.All()).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .groupBy("not_indexed").count()
           .orderBy("not_indexed").collect())
    assert [(r["not_indexed"], r["count"]) for r in got] == \
        [(10, 1), (20, 1), (30, 1)]


def test_multi_column_group_by_falls_back_on_text(t3827):
    idx, docs = t3827
    with pytest.warns(UserWarning, match=r"not a fast field"):
        assert not check_grouping_columns(idx, ["txt", "n"])
    m = compile_query(idx, ast.All()).select("doc_id")
    got = (docs.join(m, docs["id"] == m["doc_id"], "left_semi")
           .groupBy("txt", "n").count()
           .orderBy("txt", "n").collect())
    assert [(r["txt"], r["n"], r["count"]) for r in got] == \
        [("foo", 1, 1), ("foo", 2, 1), ("foo", 3, 1)]
