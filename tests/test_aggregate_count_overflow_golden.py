"""aggregate_count_overflow.out golden (PUBLIC reference behavior):
COUNT(*) over a join whose intersection involves an EMPTY term-set
docset must return 0, not error (the Tantivy
`attempt to subtract with overflow` regression in
TermSetDocSet::size_hint when advance() lands on TERMINATED).

Corpus shape: 11-row users/products (one seeded 'bob' row + 10
fillers), keyword name fields, joined on id; the shrunken proptest
case is `products.name @@@ 'bob' AND users.id @@@ '4'` where row 4
is not bob → empty intersection → count 0.

Ref: pg_search/tests/pg_regress/expected/aggregate_count_overflow.out
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

NAMES = ["alice", "bob", "cloe", "sally", "brandy", "brisket", "anchovy"]


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic stand-in for the golden's seeded random fill: row 1
    # is the pinned 'bob' row; rows 2-11 cycle the name array so row 4
    # ('cloe') is NOT bob — the empty-intersection shape
    rows = [(1, "bob", 20)] + [
        (i, NAMES[(i - 2) % 7], 20 + i) for i in range(2, 12)]
    users = spark.createDataFrame(rows, "id long, name string, age int")
    products = spark.createDataFrame(rows, "id long, name string, age int")
    mk = lambda df: build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", tokenizer="keyword")],
        numeric_fields=["age"]))
    return users, products, mk(users), mk(products)


def _count_join(corpus, u_query, p_query):
    users, products, u_idx, p_idx = corpus
    u = compile_query(u_idx, u_query).select(F.col("doc_id").alias("uid"))
    p = compile_query(p_idx, p_query).select(F.col("doc_id").alias("pid"))
    return users.join(u, users["id"] == F.col("uid"), "left_semi") \
                .join(products.join(p, products["id"] == F.col("pid"),
                                    "left_semi")
                      .select(F.col("id").alias("jid")),
                      F.col("id") == F.col("jid")) \
                .count()


def test_empty_intersection_count_zero(corpus):
    """products bob ∩ users id=4 = ∅ → 0, no error."""
    assert _count_join(corpus, ast.Term("id", 4),
                       ast.Term("name", "bob")) == 0


def test_empty_termset_intersection(corpus):
    """A TermSet matching NOTHING intersected with a live query — the
    exact size_hint underflow shape — counts 0."""
    assert _count_join(corpus,
                       ast.TermSet("name", ["zzz_nobody", "zzz_nothing"]),
                       ast.Term("name", "bob")) == 0


def test_nonempty_control(corpus):
    """Control: bob ⋈ bob on the pinned row counts ≥ 1."""
    assert _count_join(corpus, ast.Term("name", "bob"),
                       ast.Term("name", "bob")) >= 1
