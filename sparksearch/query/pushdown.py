"""ScalarArrayOpExpr pushdown planner.

Reference behavior (pg_search/src/customscan/pushdown.rs +
pg_regress/expected/pushdown_scalar_array_opexr.out): a SQL qual
``col = ANY(ARRAY[...])`` / ``col IN (...)`` rides the index as a
``term_set`` query iff the index field's terms preserve the raw
attribute value, i.e.

- non-text typed attributes (numeric / boolean / date / timestamp),
  whose single canonical term per value IS the value, and
- text attributes under a keyword-family tokenizer (``keyword`` /
  ``raw`` / ``literal`` / ``literal_normalized``) or a typed
  single-term tokenizer (``inet``, ``datetime``).

A text field under a word-splitting tokenizer (whitespace,
unicode_words, default, ngram, ...) does NOT push: its terms are token
fragments, so term-set membership would diverge from SQL equality.
The reference then leaves the qual on the heap (the golden's part-1
plans are plain ``Seq Scan ... Filter``); the Spark analog is an
attribute filter over the doc table, which :func:`compile_scalar_array`
applies when the planner declines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sparksearch.query import ast

#: tokenizers whose indexed term equals the (normalizer-folded) value
KEYWORD_FAMILY = {"keyword", "raw", "literal", "literal_normalized"}
#: typed tokenizers that emit exactly one canonical term per value
TYPED_SINGLE_TERM = {"inet", "datetime"}


def is_raw_term_field(index, field: str) -> bool:
    """True when ``field = <value>`` can be answered by an exact term
    lookup in ``index`` — the reference's pushdown-eligibility test for
    ScalarArrayOpExpr quals (pushdown.rs)."""
    docs_dtype = dict(index.docs.dtypes).get(field)
    if docs_dtype is not None and docs_dtype != "string" \
            and not docs_dtype.startswith("varchar"):
        # numeric / boolean / date / timestamp fast fields: always raw
        return True
    try:
        cfg = index.schema.field(field)
    except KeyError:
        # not an index field; equality over the doc attribute is exact
        return docs_dtype is not None
    if cfg.tokenizer in KEYWORD_FAMILY or cfg.tokenizer in TYPED_SINGLE_TERM:
        return True
    return False


def plan_scalar_array(index, field: str, values: list,
                      negated: bool = False):
    """Compile ``field = ANY(values)`` (or ``field <> ALL(values)`` when
    ``negated``) to a query AST node, or return ``None`` when the qual
    cannot ride the index and must stay on the heap.

    ``negated`` follows SQL NOT IN semantics: a NULL in ``values``
    poisons the qual (matches nothing) — the caller gets ``Empty()``,
    the same row set joinscan_notin_null_safety.out pins.
    """
    if negated and any(v is None for v in values):
        return ast.Empty()
    vals = [v for v in values if v is not None]
    if not is_raw_term_field(index, field):
        return None
    node = ast.TermSet(field, vals)
    if negated:
        # NOT IN additionally requires the column be non-NULL (SQL
        # three-valued logic: NULL <> x is unknown, filtered out)
        return ast.Boolean(must=[ast.Exists(field)], must_not=[node])
    return node


def compile_scalar_array(index, field: str, values: list,
                         negated: bool = False) -> DataFrame:
    """Matched (doc_id, score) rows for an IN / NOT IN qual — the term
    set scan when pushable, else the heap-filter fallback (constant
    score 0, like any non-scoring attribute qual)."""
    from sparksearch.query.compiler import compile_query

    node = plan_scalar_array(index, field, values, negated=negated)
    if node is not None:
        return compile_query(index, node)
    key = index.schema.key_field
    col = F.col(field)
    if negated:
        pred = ~col.isin([v for v in values if v is not None]) \
            & col.isNotNull()
        if any(v is None for v in values):
            pred = F.lit(False)
    else:
        pred = col.isin([v for v in values if v is not None])
    return (index.docs.filter(pred)
            .select(F.col(key).alias("doc_id"),
                    F.lit(0.0).cast("float").alias("score")))
