"""vector_search_pushdown.out golden (PUBLIC reference behavior): the
per-opclass matrix for vector ORDER BY pushdown.

For each pgvector opclass (vector_l2_ops / vector_cosine_ops /
vector_ip_ops) the reference builds a BM25 index naming the opclass on
the vector column, then runs one query per distance operator
(<-> L2, <=> cosine, <#> negative inner product):

- the MATCHING operator rides the TopK scan (our analog: the distance
  order + limit collapse to TakeOrderedAndProject, absorbing all
  pathkeys);
- the two MISMATCHED operators fall back to a plain sort with the
  planner's "opclass mismatch" WARNING — same rows, no TopK guarantee.

Also ported: the bare-vector-column → vector_l2_ops AM default, search
operators (=== / &&& / ||| / ###) combined with a vector ORDER BY, and
the tiebreak suite (secondary keys after the distance, descending
tiebreaks, OFFSET paging across a tie group, keys past the tie group).

Ref: pg_search/tests/pg_regress/expected/vector_search_pushdown.out
"""

import warnings

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
import sparksearch.config as cfg
from sparksearch.pipeline.similarity import (
    vector_distance, vector_order_search, vector_topk)
from sparksearch.query import ast

# the 5-row corpus: K=2 ordering unambiguous under all three metrics
VSP = [
    (1, "east wind",  [1.0, 0.0, 0.0]),
    (2, "east gate",  [0.9, 0.0, 0.1]),
    (3, "north wind", [0.0, 1.0, 0.0]),
    (4, "up draft",   [0.0, 0.0, 1.0]),
    (5, "mid point",  [0.7, 0.7, 0.0]),
]
Q = [1.0, 0.0, 0.0]

OPS = ("<->", "<=>", "<#>")
OP_METRIC = {"<->": "l2", "<=>": "cosine", "<#>": "ip"}


def _vsp(spark):
    return spark.createDataFrame(
        VSP, "id long, label string, vec array<double>")


def _index(spark, opclass):
    df = _vsp(spark)
    schema = IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="label")],
        vector_fields={"vec": opclass})
    return build_index(df, schema), df


def _ids(df):
    return [r["id"] for r in df.collect()]


@pytest.mark.parametrize("opclass,metric", [
    ("vector_l2_ops", "l2"), ("vector_cosine_ops", "cosine"),
    ("vector_ip_ops", "ip")])
def test_opclass_matrix(spark, opclass, metric):
    """3 opclasses x 3 operators: match pushes down silently, mismatch
    warns and falls back; every cell returns ids [1, 2] on this corpus
    (golden lines 35-360)."""
    idx, df = _index(spark, opclass)
    for op in OPS:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = vector_order_search(idx, ast.All(), df, Q,
                                      vec_col="vec", op=op, k=2)
            got = _ids(out)
        assert got == [1, 2], (opclass, op, got)
        msgs = [str(w.message) for w in caught
                if "Top K scan" in str(w.message)]
        if OP_METRIC[op] == metric:
            # match: silent TopK push down — TakeOrderedAndProject
            assert not msgs, (opclass, op, msgs)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "TakeOrderedAndProject" in plan
        else:
            # mismatch: the reference planner WARNING, text-for-text
            assert any("not using Top K scan (using Normal instead)"
                       in m for m in msgs), (opclass, op, msgs)
            want_rebuild = f"vector_{OP_METRIC[op]}_ops"
            assert any(f"rebuild the index with the {want_rebuild} "
                       "opclass" in m for m in msgs)
            assert any(f"change the ORDER BY operator to "
                       f"{ {'l2': '<->', 'cosine': '<=>', 'ip': '<#>'}[metric] }"
                       in m for m in msgs)


def test_bare_vector_column_defaults_to_l2(spark):
    """A bare vector column resolves to vector_l2_ops, the AM default
    (golden lines 405-440)."""
    df = _vsp(spark)
    schema = IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="label")],
        vector_fields={"vec": None})
    assert schema.vector_opclass("vec") == "l2"
    idx = build_index(df, schema)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = _ids(vector_order_search(idx, ast.All(), df, Q,
                                       vec_col="vec", op="<->", k=2))
    assert got == [1, 2]
    assert not [w for w in caught if "Top K scan" in str(w.message)]


def test_check_topk_scan_guc_disables_warning(spark):
    """SET paradedb.check_topk_scan = false silences the mismatch
    warning (the golden's warning text names the escape hatch)."""
    idx, df = _index(spark, "vector_l2_ops")
    cfg.set(check_topk_scan=False)
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = _ids(vector_order_search(idx, ast.All(), df, Q,
                                           vec_col="vec", op="<=>", k=2))
        assert got == [1, 2]
        assert not [w for w in caught if "Top K scan" in str(w.message)]
    finally:
        cfg.set(check_topk_scan=True)


def test_search_operators_with_vector_order(spark):
    """=== / &&& / ||| / ### predicates combined with a vector ORDER BY
    rank only the rows the predicate matches (golden lines 443-540)."""
    idx, df = _index(spark, "vector_cosine_ops")

    def run(node):
        return _ids(vector_order_search(idx, node, df, Q,
                                        vec_col="vec", op="<=>", k=2))

    # === (term): rows 1 and 3 contain 'wind'; ranked 1 then 3
    assert run(ast.Term("label", "wind")) == [1, 3]
    # &&& (all terms): only row 1 has both 'east' and 'wind'
    assert run(ast.Match("label", "east wind",
                         conjunction_mode=True)) == [1]
    # ||| (any term): rows 1,2,3 match 'gate wind'; top-2 are 1 then 2
    assert run(ast.Match("label", "gate wind",
                         conjunction_mode=False)) == [1, 2]
    # ### (phrase): only row 1 contains the phrase 'east wind'
    assert run(ast.TokenizedPhrase("label", "east wind")) == [1]


# ============================================================
# Tiebreaking: secondary ORDER BY keys after vector distance
# (golden lines 543-646).  Rows 1-4 are exact duplicates of the query
# vector: their distances tie, the secondary key decides the ordering
# AND which rows survive the top-K heap when LIMIT < the tie group.
# ============================================================
VSP_TIE = [
    (1, "b", [1.0, 0.0, 0.0]),
    (2, "a", [1.0, 0.0, 0.0]),
    (3, "b", [1.0, 0.0, 0.0]),
    (4, "a", [1.0, 0.0, 0.0]),
    (5, "x", [0.0, 1.0, 0.0]),
    (6, "y", [0.0, 0.9, 0.1]),
]


@pytest.fixture(scope="module")
def tie(spark):
    df = spark.createDataFrame(
        VSP_TIE, "id long, cat string, vec array<double>")
    schema = IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="cat", tokenizer="keyword")],
        vector_fields={"vec": "vector_l2_ops"})
    return build_index(df, schema), df


def test_tiebreak_limit_within_tie_group(tie, spark):
    # LIMIT 3 < the 4-way tie: the three lowest ids must win the heap
    idx, df = tie
    out = vector_order_search(idx, ast.All(), df, Q, vec_col="vec",
                              op="<->", k=3, tiebreak=[("id", True)])
    assert _ids(out) == [1, 2, 3]
    # both pathkeys absorbed by the TopK scan (no separate Sort node)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_tiebreak_descending(tie):
    idx, df = tie
    got = _ids(vector_order_search(idx, ast.All(), df, Q, vec_col="vec",
                                   op="<->", k=3,
                                   tiebreak=[("id", False)]))
    assert got == [4, 3, 2]


def test_tiebreak_offset_paging_across_tie(tie):
    # OFFSET pagination across the tie is deterministic, non-overlapping
    idx, df = tie
    got = _ids(vector_order_search(idx, ast.All(), df, Q, vec_col="vec",
                                   op="<->", k=2, offset=2,
                                   tiebreak=[("id", True)]))
    assert got == [3, 4]


def test_limit_past_tie_group_orders_by_distance(tie):
    # farther rows are ordered by distance, not tiebreak: 6 before 5
    idx, df = tie
    got = _ids(vector_order_search(idx, ast.All(), df, Q, vec_col="vec",
                                   op="<->", k=6,
                                   tiebreak=[("id", True)]))
    assert got == [1, 2, 3, 4, 6, 5]


def test_two_tiebreak_keys(tie):
    # cat ASC then id DESC within equal distance
    idx, df = tie
    out = vector_order_search(idx, ast.All(), df, Q, vec_col="vec",
                              op="<->", k=4,
                              tiebreak=[("cat", True), ("id", False)])
    got = [(r["id"], r["cat"]) for r in out.collect()]
    assert got == [(4, "a"), (2, "a"), (3, "b"), (1, "b")]


def test_distance_values_are_pgvector_exact(spark):
    """<-> is Euclidean distance, <=> is 1 - cos, <#> is -dot — the
    pgvector operator definitions (golden header comment)."""
    df = _vsp(spark)
    row = (df.filter("id = 2")
           .select(vector_distance(df["vec"], Q, "l2").alias("l2"),
                   vector_distance(df["vec"], Q, "cosine").alias("cos"),
                   vector_distance(df["vec"], Q, "ip").alias("ip"))
           .collect()[0])
    assert row["l2"] == pytest.approx((0.1 ** 2 + 0.1 ** 2) ** 0.5)
    assert row["cos"] == pytest.approx(1 - 0.9 / (0.81 + 0.01) ** 0.5)
    assert row["ip"] == pytest.approx(-0.9)


def test_vector_topk_unknown_metric_raises(spark):
    with pytest.raises(ValueError, match="unknown vector metric"):
        vector_topk(_vsp(spark), "vec", Q, metric="dotproduct")
    with pytest.raises(ValueError, match="unknown distance operator"):
        idx, df = _index(spark, "vector_l2_ops")
        vector_order_search(idx, ast.All(), df, Q, op="<@>")
