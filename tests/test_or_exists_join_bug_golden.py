"""or_exists_join_bug.out golden (PUBLIC reference behavior): OR EXISTS
under multi-join EXISTS chains — the rt_fetch out-of-bounds regression
corpus.  Round-5 FULL port (r4 verdict ask #6) — and a correction of
the r4 adjudication note: Test 3's 0 rows is NOT a planner bug.
``paradedb.term('item_type', 'typeA')`` is a RAW term (no analyzer —
citext.out Test 5 semantics) probing a default-tokenizer index that
stored ``typea``, so the chain's typeA leg matches nothing; Tests 4-6
return rows through their OTHER branch (status/priority), and Tests
7-8 drop the typeA constraint entirely.  Every section is internally
consistent and this engine reproduces all eight verbatim.

Ref: pg_search/tests/pg_regress/expected/or_exists_join_bug.out
"""

import json

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def fix(spark):
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
        [(1, "test content 1", json.dumps({"processed": True})),
         (2, "test content 2", json.dumps({"processed": False})),
         (3, "test content 3", None)],
        "id int, content string, metadata string")
    idx = {
        "u": build_index(users, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="name")],
            numeric_fields=["org_id"])),
        "t": build_index(tasks, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="status")],
            numeric_fields=["user_id", "priority"])),
        "ti": build_index(task_items, IndexSchema(
            key_field="id", text_fields=[FieldConfig(name="item_type")],
            numeric_fields=["task_id"])),
        "d": build_index(details, IndexSchema(
            key_field="id",
            text_fields=[FieldConfig(name="content"),
                         FieldConfig(name="metadata",
                                     tokenizer="json")])),
    }
    return dict(u=users, t=tasks, ti=task_items, idd=item_details,
                d=details, idx=idx)


def _ids(fix_, which, node):
    """doc_ids of ``which``'s index matching ``node``."""
    return compile_query(fix_["idx"][which], node).select("doc_id")


def _sem(df, col, ids):
    return df.join(ids, df[col] == ids["doc_id"], "left_semi")


def _chain_task_ids(fix_, item_type="typeA", detail_node=None,
                    content_node=None):
    """task ids with EXISTS(ti JOIN item_details JOIN details ...):
    ti matches item_type (when given), d matches detail_node /
    content_node — the golden's three-table EXISTS chain."""
    ti = fix_["ti"]
    if item_type is not None:
        ti = _sem(ti, "id", _ids(fix_, "ti",
                                 ast.Term("item_type", item_type)))
    d_ids = None
    if detail_node is not None:
        d_ids = _ids(fix_, "d", detail_node)
    j = (ti.select(F.col("id").alias("tiid"), "task_id")
         .join(fix_["idd"], F.col("tiid") == F.col("task_item_id")))
    if d_ids is not None:
        j = j.join(d_ids, j["detail_id"] == d_ids["doc_id"], "left_semi")
    if content_node is not None:
        j = j.join(_ids(fix_, "d", content_node),
                   j["detail_id"] == F.col("doc_id"), "left_semi")
    return j.select(F.col("task_id").alias("doc_id")).distinct()


def _users_with(fix_, org, task_ids):
    u = _sem(fix_["u"], "id", _ids(fix_, "u", ast.Term("org_id", org)))
    user_ids = (_sem(fix_["t"], "id", task_ids)
                .select(F.col("user_id").alias("doc_id")).distinct())
    out = _sem(u, "id", user_ids)
    return [(r["id"], r["name"]) for r in
            out.orderBy("id").select("id", "name").collect()]


def test_1_simple_term(fix):
    u = _sem(fix["u"], "id", _ids(fix, "u", ast.Term("org_id", 1)))
    assert [(r["id"], r["name"]) for r in
            u.orderBy("id").select("id", "name").collect()] == \
        [(1, "Alice"), (2, "Bob")]


def test_2_simple_exists(fix):
    t_ok = _ids(fix, "t", ast.Term("status", "completed"))
    assert _users_with(fix, 1, t_ok) == [(1, "Alice")]


def test_3_and_exists_chain(fix):
    """0 rows, reference-exact: the raw term 'typeA' misses the
    lowercase-normalized item_type index, so AND-ing the chain in
    empties the result (see module docstring — internally consistent,
    not a planner bug)."""
    assert _ids(fix, "ti", ast.Term("item_type", "typeA")).count() == 0
    both = _ids(fix, "t", ast.Term("status", "completed")).intersect(
        _chain_task_ids(fix,
                        detail_node=ast.Exists("metadata.processed")))
    assert _users_with(fix, 1, both) == []


def test_4_or_exists_chain(fix):
    t_ok = (_ids(fix, "t", ast.Term("status", "completed"))
            .unionByName(_chain_task_ids(
                fix, detail_node=ast.Exists("metadata.processed")))
            .distinct())
    assert _users_with(fix, 1, t_ok) == [(1, "Alice")]


def test_5_or_exists_native_json(fix):
    """Workaround variant: the detail filter is a native JSON
    projection (metadata->>'processed' = 'true'), not a search
    predicate — only detail 1 qualifies now, same final row."""
    d_true = (fix["d"]
              .filter(F.get_json_object("metadata", "$.processed")
                      == "true")
              .select(F.col("id").alias("doc_id")))
    ti = _sem(fix["ti"], "id",
              _ids(fix, "ti", ast.Term("item_type", "typeA")))
    chain = (ti.select(F.col("id").alias("tiid"), "task_id")
             .join(fix["idd"], F.col("tiid") == F.col("task_item_id"))
             .join(d_true, F.col("detail_id") == d_true["doc_id"],
                   "left_semi")
             .select(F.col("task_id").alias("doc_id")).distinct())
    t_ok = (_ids(fix, "t", ast.Term("status", "completed"))
            .unionByName(chain).distinct())
    assert _users_with(fix, 1, t_ok) == [(1, "Alice")]


def test_6_or_exists_other_join_order(fix):
    t_ok = (_ids(fix, "t", ast.Term("priority", 3))
            .unionByName(_chain_task_ids(
                fix, item_type=None,
                content_node=ast.Term("content", "test")))
            .distinct())
    assert _users_with(fix, 2, t_ok) == [(3, "Charlie")]


def test_7_minimal_exists(fix):
    """SELECT 1 WHERE EXISTS(FALSE OR EXISTS(chain)) → one row."""
    chain_nonempty = _chain_task_ids(
        fix, item_type=None,
        detail_node=ast.Exists("metadata.processed")).count() > 0
    assert (False or chain_nonempty) is True


def test_8_deeply_nested_or_exists(fix):
    """ti matches typeA OR EXISTS(detail with metadata.processed via
    item_details) — detail 2's metadata carries the key (value false,
    still EXISTS), so Bob's typeB item qualifies through the inner
    branch and both org-1 users return."""
    ti_type = _ids(fix, "ti", ast.Term("item_type", "typeA"))
    d_ids = _ids(fix, "d", ast.Exists("metadata.processed"))
    ti_inner = (fix["idd"]
                .join(d_ids, fix["idd"]["detail_id"] == d_ids["doc_id"],
                      "left_semi")
                .select(F.col("task_item_id").alias("doc_id"))
                .distinct())
    ti_ok = ti_type.unionByName(ti_inner).distinct()
    t_inner = (_sem(fix["ti"], "id", ti_ok)
               .select(F.col("task_id").alias("doc_id")).distinct())
    t_ok = (_ids(fix, "t", ast.Term("status", "completed"))
            .unionByName(t_inner).distinct())
    assert _users_with(fix, 1, t_ok) == [(1, "Alice"), (2, "Bob")]
