"""issue_5108.out golden (PUBLIC reference behavior, tables replicated
inline): regression for the reference's #5108 — placeholder functions
(pdb.score / pdb.snippet / pdb.snippet_positions) panicked with
"Unsupported query shape" in parallel plans using COMMA-JOIN syntax
(``FROM a, b WHERE ...``).  Every placeholder family must survive the
join and stay populated:

1. score through a comma join, ORDER BY s DESC, id LIMIT 100;
2. snippet through the same join, ORDER BY snip DESC (byte order);
3. snippet_positions, ORDER BY pos DESC (all equal → id tiebreak);
4. CTE TopK (score desc, id, LIMIT 100) consumed by a parent join —
   rides the TopK scan, NO check_topk_scan warning;
5. an unpushable ORDER BY + LIMIT on the same table still fires the
   planner warning text-for-text (the reference's section 5 warns on
   ORDER BY snip).

Corpus: 10 docs ``doc_g.pdf``; 6000 chunks where every third body is
``healthcare notes g`` (dl=3) and the rest ``unrelated g`` (dl=2) —
N=6000, df(healthcare)=2000, avgdl=7/3 → BM25 = 0.9835667 for every
match (pinned float32-exact).

Ref: pg_search/tests/pg_regress/expected/issue_5108.out
"""

import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.highlight import with_snippet, with_snippet_positions
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.query.search import search

SCORE = np.float32(0.9835667)
QUERY = ast.Match("body", "healthcare")


def _filename(g: int) -> str:
    return f"doc_{((g - 1) % 10) + 1}.pdf"


MATCH_IDS = [g for g in range(1, 6001) if g % 3 == 0]


@pytest.fixture(scope="module")
def fx(spark):
    docs = spark.createDataFrame(
        [(d, f"doc_{d}.pdf") for d in range(1, 11)],
        "id long, filename string")
    chunks = spark.createDataFrame(
        [(g, ((g - 1) % 10) + 1,
          f"healthcare notes {g}" if g % 3 == 0 else f"unrelated {g}")
         for g in range(1, 6001)],
        "id long, doc_id long, body string")
    idx = build_index(chunks, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")]))
    idx.table_name = "issue_5108_chunks"
    return docs, chunks, idx


def _comma_join(fx, extra_cols):
    """``FROM issue_5108_chunks c, issue_5108_docs d WHERE d.id =
    c.doc_id AND c.id @@@ match(...)`` — the #5108 danger shape: the
    match set rides INTO the join instead of being consumed before it."""
    docs, chunks, idx = fx
    m = compile_query(idx, QUERY).select(
        F.col("doc_id").alias("c_k"), F.col("score").alias("s"))
    return (chunks.alias("c")
            .join(m, F.col("c.id") == F.col("c_k"))
            .join(docs.alias("d"), F.col("d.id") == F.col("c.doc_id"))
            .select("c.id", "c.body", "d.filename", "s"))


def test_score_through_comma_join(fx):
    """Section 1: uniform BM25 through the join, id-asc tiebreak."""
    got = (_comma_join(fx, None)
           .orderBy(F.col("s").desc(), F.col("id").asc())
           .limit(100).collect())
    assert [(r.body, r.filename, np.float32(r.s)) for r in got] == [
        (f"healthcare notes {g}", _filename(g), SCORE)
        for g in MATCH_IDS[:100]]


def test_snippet_through_comma_join(fx):
    """Section 2: ORDER BY snip DESC, id — byte-order string sort over
    the highlighted text, parity with the reference's pinned page."""
    docs, chunks, idx = fx
    j = _comma_join(fx, None)
    snipped = with_snippet(idx, j, QUERY, "body", out_col="snip")
    got = (snipped.orderBy(F.col("snip").desc(), F.col("id").asc())
           .limit(100).select("snip", "filename").collect())
    # snip DESC, id ASC: stable sort by id, then reverse-sort by the
    # snippet text (byte order; all-ASCII here so python == UTF-8)
    exp = sorted(
        sorted(((f"<b>healthcare</b> notes {g}", _filename(g), g)
                for g in MATCH_IDS), key=lambda t: t[2]),
        key=lambda t: t[0], reverse=True)[:100]
    assert [(r.snip, r.filename) for r in got] == [
        (s, f) for s, f, _ in exp]
    # spot-pin the reference's first page head (issue_5108.out:223-233)
    assert [r.snip for r in got[:5]] == [
        "<b>healthcare</b> notes 999", "<b>healthcare</b> notes 996",
        "<b>healthcare</b> notes 993", "<b>healthcare</b> notes 990",
        "<b>healthcare</b> notes 99"]


def test_snippet_positions_through_comma_join(fx):
    """Section 3: every match highlights chars [0,10); all-equal pos
    arrays fall through to the id tiebreak."""
    docs, chunks, idx = fx
    j = _comma_join(fx, None)
    pos = with_snippet_positions(idx, j, QUERY, "body", out_col="pos")
    got = (pos.orderBy(F.col("pos").desc(), F.col("id").asc())
           .limit(100).select("pos", "filename").collect())
    assert [([[p.start, p.end] for p in r.pos], r.filename)
            for r in got] == [
        ([[0, 10]], _filename(g)) for g in MATCH_IDS[:100]]


def test_cte_topk_then_join_no_warning(fx):
    """Section 4: the safe shape — TopK (score desc, id, LIMIT 100)
    resolved at a single-table level, THEN joined; rows identical to
    the comma-join form and no check_topk_scan warning fires."""
    docs, chunks, idx = fx
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m = search(idx, QUERY, limit=100,
                   order_by=[("score", "desc"), ("id", "asc")],
                   columns=["id", "body", "doc_id"])
    got = (m.alias("m")
           .join(docs.alias("d"), F.col("d.id") == F.col("m.doc_id"))
           .orderBy(F.col("m.score").desc(), F.col("m.id").asc())
           .select("m.body", "d.filename", "m.score").collect())
    assert [(r.body, r.filename, np.float32(r.score)) for r in got] == [
        (f"healthcare notes {g}", _filename(g), SCORE)
        for g in MATCH_IDS[:100]]


def test_unpushable_order_still_warns(fx):
    """Section 5: ORDER BY over a value the index can't serve (the
    reference orders by the snippet; the tokenized body column is the
    same planner class) + LIMIT → Normal scan + the exact warning."""
    docs, chunks, idx = fx
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        search(idx, QUERY, limit=100, order_by=[("body", "desc")],
               columns=["id", "body", "doc_id"]).collect()
    msgs = [str(x.message) for x in w]
    assert any(m == (
        "Query has LIMIT 100 but is not using Top K scan (using Normal "
        "instead). Reason: ORDER BY columns cannot be pushed down to the "
        "index. This may cause poor performance on large datasets. "
        "Remedies: Ensure ORDER BY columns are indexed. Numeric columns "
        "are fast by default. For string columns, use pdb.literal "
        "tokenizer. To disable this warning: SET paradedb.check_topk_scan "
        "= false (table: issue_5108_chunks)") for m in msgs), msgs
