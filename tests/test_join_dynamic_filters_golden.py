"""join_hash_dynamic_filters_sparse.out golden (PUBLIC reference
behavior, issue #4895): hash-join dynamic-filter pushdown on sparse
(distinct-per-row) FK columns at 1, 2, and 3 filter columns.  The
reference's correctness gate (its Block B) compares the gallop and
linear dispatch strategies row-for-row; the engine's analog compares
the BUILD-SIDE IN-LIST pushdown (collect the small side's keys,
term-set the fast column) against the plain shuffle join — both must
return the identical deterministic pages:

- Q1 (t2_a only):    t1.id ∈ [1, 1100]   → LIMIT 10 = 1..10
- Q2 (∩ t2_b):       ∩ [500, 1599]       → 500..509
- Q3 (∩ t2_c):       ∩ [800, 1899]       → 800..809

Ref: pg_search/tests/pg_regress/expected/join_hash_dynamic_filters_sparse.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


@pytest.fixture(scope="module")
def sparse(spark):
    i = F.col("id")
    t1 = spark.range(1, 30_001).select(
        i.alias("id"),
        F.concat(F.lit("doc "), i.cast("string")).alias("body"),
        (i * 7919 % 100_000).alias("fk_a"),
        (i * 6151 % 100_000).alias("fk_b"),
        (i * 4099 % 100_000).alias("fk_c"))
    t2 = {}
    for name, prime, lo, hi in [("a", 7919, 1, 1100),
                                ("b", 6151, 500, 1599),
                                ("c", 4099, 800, 1899)]:
        t2[name] = spark.range(lo, hi + 1).select(
            i.alias("id"), (i * prime % 100_000).alias("fk"),
            F.concat(F.lit("doc "), i.cast("string")).alias("body"))
    idx = build_index(t1, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")],
        numeric_fields=["fk_a", "fk_b", "fk_c"],
        sort_by="fk_a ASC"))
    return t1, t2, idx


def _pages(sparse_fix, cols):
    """(plain-join page, IN-list-pushdown page) for the given
    (fk_col, t2_name) join list."""
    t1, t2, idx = sparse_fix
    matched = t1.join(
        compile_query(idx, ast.Parse("doc", field="body"))
        .select("doc_id"), t1["id"] == F.col("doc_id"), "left_semi")

    plain = matched
    for fk_col, name in cols:
        plain = plain.join(
            t2[name].select(F.col("fk").alias(f"__fk_{name}")),
            plain[fk_col] == F.col(f"__fk_{name}"), "left_semi")
    plain_page = [r["id"] for r in
                  plain.select("id").orderBy("id").limit(10).collect()]

    # dynamic-filter analog: collect each build side's keys (1100 values,
    # bounded) and push them as attr term-sets into ONE indexed query
    q = ast.Parse("doc", field="body")
    for fk_col, name in cols:
        keys = [r["fk"] for r in t2[name].select("fk").collect()]
        q = ast.Boolean(must=[q, ast.TermSet(fk_col, keys)])
    pushed = compile_query(idx, q).select("doc_id")
    pushed_page = [r["doc_id"] for r in
                   pushed.orderBy("doc_id").limit(10).collect()]
    return plain_page, pushed_page


def test_q1_one_filter_column(sparse):
    plain, pushed = _pages(sparse, [("fk_a", "a")])
    assert plain == pushed == list(range(1, 11))


def test_q2_two_filter_columns(sparse):
    plain, pushed = _pages(sparse, [("fk_a", "a"), ("fk_b", "b")])
    assert plain == pushed == list(range(500, 510))


def test_q3_three_filter_columns(sparse):
    plain, pushed = _pages(sparse, [("fk_a", "a"), ("fk_b", "b"),
                                    ("fk_c", "c")])
    assert plain == pushed == list(range(800, 810))
