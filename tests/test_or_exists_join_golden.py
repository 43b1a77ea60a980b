"""or_exists_join_bug.out golden (PUBLIC reference behavior):
correlated [OR] EXISTS chains across FIVE bm25-indexed tables
(users → tasks → task_items → item_details → details), the
rt_fetch-out-of-bounds regression corpus.

Each EXISTS compiles to a semi-join against the subquery's indexed
match set; OR-EXISTS is the union of the semi-join keys — all
composed as DataFrame joins over per-index compiled match sets, so
arbitrarily deep nesting can never hit a range-table bound.

Documented divergence — Test 3: the reference prints 0 rows on its
JoinScan-rejected path, but its OWN Tests 7/8 evaluate the identical
innermost EXISTS (typeA item → detail with metadata.processed
present) to TRUE, and plain SQL gives Alice (task 1 is completed AND
its typeA item's detail d1 carries {"processed": true}).  This engine
returns the SQL answer.

Ref: pg_search/tests/pg_regress/expected/or_exists_join_bug.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def corpus(spark):
    users = spark.createDataFrame(
        [(1, 1, "Alice"), (2, 1, "Bob"), (3, 2, "Charlie")],
        "id int, org_id int, name string")
    tasks = spark.createDataFrame(
        [(1, 1, "completed", 1), (2, 2, "pending", 2),
         (3, 3, "completed", 3)],
        "id int, user_id int, status string, priority int")
    task_items = spark.createDataFrame(
        [(1, 1, "typeA"), (2, 2, "typeB"), (3, 3, "typeA")],
        "id int, task_id int, item_type string")
    item_details = spark.createDataFrame(
        [(1, 1, 1), (2, 2, 2), (3, 3, 3)],
        "id int, task_item_id int, detail_id int")
    details = spark.createDataFrame(
        [(1, "test content 1", '{"processed": true}'),
         (2, "test content 2", '{"processed": false}'),
         (3, "test content 3", None)],
        "id int, content string, metadata string")
    idx = {
        "u": build_index(users, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="name")],
            numeric_fields=["org_id"])),
        "t": build_index(tasks, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="status",
                                                     tokenizer="keyword")],
            numeric_fields=["user_id", "priority"])),
        "ti": build_index(task_items, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="item_type",
                                                     tokenizer="keyword")],
            numeric_fields=["task_id"])),
        "d": build_index(details, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="content"),
                                         FieldConfig(name="metadata",
                                                     tokenizer="json")])),
    }
    return users, tasks, task_items, item_details, details, idx


def _ids(df, col="doc_id"):
    return sorted(r[col] for r in df.collect())


def _inner_exists_task_ids(corpus):
    """task ids with EXISTS(typeA item ⋈ detail WHERE
    metadata.processed exists) — the triple-join subquery."""
    _, _, task_items, item_details, _, idx = corpus
    ti_a = compile_query(idx["ti"], ast.Term("item_type", "typeA")) \
        .select(F.col("doc_id").alias("tiid"))
    d_p = compile_query(idx["d"], ast.Exists("metadata.processed")) \
        .select(F.col("doc_id").alias("did"))
    return (task_items
            .join(ti_a, task_items["id"] == F.col("tiid"), "left_semi")
            .join(item_details.join(d_p,
                                    item_details["detail_id"] == F.col("did"),
                                    "left_semi")
                  .select(F.col("task_item_id").alias("tiid2")),
                  F.col("id") == F.col("tiid2"), "left_semi")
            .select(F.col("task_id").alias("tid")))


def test_1_simple_term(corpus):
    *_, idx = corpus
    got = compile_query(idx["u"], ast.Term("org_id", 1))
    assert _ids(got) == [1, 2]


def test_2_and_exists(corpus):
    users, tasks, *_, idx = corpus
    u = compile_query(idx["u"], ast.Term("org_id", 1)) \
        .select(F.col("doc_id").alias("uid"))
    t = compile_query(idx["t"], ast.Term("status", "completed")) \
        .select(F.col("doc_id").alias("tid"))
    sub = tasks.join(t, tasks["id"] == F.col("tid"), "left_semi") \
               .select(F.col("user_id").alias("uid2"))
    got = users.join(u, users["id"] == F.col("uid"), "left_semi") \
               .join(sub, users["id"] == F.col("uid2"), "left_semi")
    assert _ids(got, "id") == [1]


def test_3_and_exists_multi_join(corpus):
    """SQL truth: Alice (see module docstring divergence note)."""
    users, tasks, *_, idx = corpus
    u = compile_query(idx["u"], ast.Term("org_id", 1)) \
        .select(F.col("doc_id").alias("uid"))
    t_completed = compile_query(idx["t"], ast.Term("status", "completed")) \
        .select(F.col("doc_id").alias("tid"))
    inner = _inner_exists_task_ids(corpus)
    sub = (tasks.join(t_completed, tasks["id"] == F.col("tid"), "left_semi")
                .join(inner, tasks["id"] == F.col("tid"), "left_semi")
                .select(F.col("user_id").alias("uid2")))
    got = users.join(u, users["id"] == F.col("uid"), "left_semi") \
               .join(sub, users["id"] == F.col("uid2"), "left_semi")
    assert _ids(got, "id") == [1]


def _or_exists_users(corpus, org, task_arm):
    """users in org with EXISTS(task of theirs matching task_arm OR the
    triple-join inner EXISTS)."""
    users, tasks, *_, idx = corpus
    u = compile_query(idx["u"], ast.Term("org_id", org)) \
        .select(F.col("doc_id").alias("uid"))
    t_arm = compile_query(idx["t"], task_arm) \
        .select(F.col("doc_id").alias("tid"))
    inner = _inner_exists_task_ids(corpus)
    qualifying = tasks.join(
        t_arm.unionByName(inner.select(F.col("tid"))).distinct(),
        tasks["id"] == F.col("tid"), "left_semi") \
        .select(F.col("user_id").alias("uid2"))
    return users.join(u, users["id"] == F.col("uid"), "left_semi") \
                .join(qualifying, users["id"] == F.col("uid2"), "left_semi")


def test_4_or_exists_multi_join(corpus):
    got = _or_exists_users(corpus, 1, ast.Term("status", "completed"))
    assert _ids(got, "id") == [1]


def test_5_native_predicate_workaround(corpus):
    """Inner detail filter via the native JSON predicate
    (metadata->>'processed' = 'true') instead of the search exists —
    same answer: Alice."""
    users, tasks, task_items, item_details, details, idx = corpus
    u = compile_query(idx["u"], ast.Term("org_id", 1)) \
        .select(F.col("doc_id").alias("uid"))
    t_completed = compile_query(idx["t"], ast.Term("status", "completed")) \
        .select(F.col("doc_id").alias("tid"))
    ti_a = compile_query(idx["ti"], ast.Term("item_type", "typeA")) \
        .select(F.col("doc_id").alias("tiid"))
    d_true = details.filter(
        F.get_json_object("metadata", "$.processed") == "true") \
        .select(F.col("id").alias("did"))
    inner = (task_items
             .join(ti_a, task_items["id"] == F.col("tiid"), "left_semi")
             .join(item_details.join(d_true,
                                     item_details["detail_id"]
                                     == F.col("did"), "left_semi")
                   .select(F.col("task_item_id").alias("tiid2")),
                   F.col("id") == F.col("tiid2"), "left_semi")
             .select(F.col("task_id").alias("tid")))
    qualifying = tasks.join(
        t_completed.unionByName(inner).distinct(),
        tasks["id"] == F.col("tid"), "left_semi") \
        .select(F.col("user_id").alias("uid2"))
    got = users.join(u, users["id"] == F.col("uid"), "left_semi") \
               .join(qualifying, users["id"] == F.col("uid2"), "left_semi")
    assert _ids(got, "id") == [1]


def test_6_different_join_order(corpus):
    """org 2, priority-3 arm OR content:'test' via the reversed join
    chain → Charlie."""
    users, tasks, task_items, item_details, details, idx = corpus
    u = compile_query(idx["u"], ast.Term("org_id", 2)) \
        .select(F.col("doc_id").alias("uid"))
    t_arm = compile_query(idx["t"], ast.Term("priority", 3)) \
        .select(F.col("doc_id").alias("tid"))
    d_test = compile_query(idx["d"], ast.Term("content", "test")) \
        .select(F.col("doc_id").alias("did"))
    inner = (item_details
             .join(d_test, item_details["detail_id"] == F.col("did"),
                   "left_semi")
             .join(task_items.select(F.col("id").alias("tiid3"),
                                     F.col("task_id").alias("tid")),
                   F.col("task_item_id") == F.col("tiid3"))
             .select("tid"))
    qualifying = tasks.join(t_arm.unionByName(inner).distinct(),
                            tasks["id"] == F.col("tid"), "left_semi") \
        .select(F.col("user_id").alias("uid2"))
    got = users.join(u, users["id"] == F.col("uid"), "left_semi") \
               .join(qualifying, users["id"] == F.col("uid2"), "left_semi")
    assert _ids(got, "id") == [3]


def test_7_minimal_repro(corpus):
    """FALSE OR EXISTS(triple join with metadata.processed) → true."""
    task_items, item_details = corpus[2], corpus[3]
    idx = corpus[5]
    d_p = compile_query(idx["d"], ast.Exists("metadata.processed")) \
        .select(F.col("doc_id").alias("did"))
    joined = (task_items
              .join(item_details.select(F.col("task_item_id").alias("tiid"),
                                        "detail_id"),
                    task_items["id"] == F.col("tiid"))
              .join(d_p, F.col("detail_id") == F.col("did"), "left_semi"))
    assert joined.count() > 0


def test_8_deeply_nested_or_exists(corpus):
    """typeA arm OR (detail-exists arm) nested INSIDE the task_items
    level → Alice and Bob (Bob via d2's present-but-false
    'processed')."""
    users, tasks, task_items, item_details, details, idx = corpus
    u = compile_query(idx["u"], ast.Term("org_id", 1)) \
        .select(F.col("doc_id").alias("uid"))
    t_completed = compile_query(idx["t"], ast.Term("status", "completed")) \
        .select(F.col("doc_id").alias("tid"))
    ti_a = compile_query(idx["ti"], ast.Term("item_type", "typeA")) \
        .select(F.col("doc_id").alias("tiid"))
    d_p = compile_query(idx["d"], ast.Exists("metadata.processed")) \
        .select(F.col("doc_id").alias("did"))
    # ti-level OR: item is typeA OR its detail has the key
    ti_detail = item_details.join(
        d_p, item_details["detail_id"] == F.col("did"), "left_semi") \
        .select(F.col("task_item_id").alias("tiid"))
    ti_match = task_items.join(
        ti_a.unionByName(ti_detail).distinct(),
        task_items["id"] == F.col("tiid"), "left_semi") \
        .select(F.col("task_id").alias("tid"))
    qualifying = tasks.join(
        t_completed.unionByName(ti_match).distinct(),
        tasks["id"] == F.col("tid"), "left_semi") \
        .select(F.col("user_id").alias("uid2"))
    got = users.join(u, users["id"] == F.col("uid"), "left_semi") \
               .join(qualifying, users["id"] == F.col("uid2"), "left_semi")
    assert _ids(got, "id") == [1, 2]
