"""Top-k search execution with late materialization.

Reference analog: BaseScan's TopKScanExecState (per-segment top-k
collectors merged at the leader — basescan/exec_methods/top_k.rs:59-120).
Spark restatement: ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject, which already does per-partition top-k + merge; we
add the reference's *late materialization* pattern
(scan/late_materialization.rs:17-40): sort on the narrow (doc_id, score,
sort-key) projection, take K, then join back to the doc table for the
display columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from sparksearch.query.compiler import compile_query
from sparksearch.query import ast as qast


def _as_query(index, query):
    if isinstance(query, str):
        return qast.Parse(query)
    if isinstance(query, dict):
        # the reference's ``@@@ '<json>'::jsonb`` wire form
        # (complex_query_series_view.out)
        from sparksearch.query.json_input import from_json
        return from_json(query)
    return query


def _dir(col, direction: str):
    """Sort expression with the REFERENCE's (Postgres) null placement
    defaults — ASC → NULLS LAST, DESC → NULLS FIRST (pg_regress
    nulls_ordering.out) — which are the OPPOSITE of Spark's ASC default.
    Explicit ``"asc nulls first"`` / ``"desc nulls last"`` override."""
    d = direction.lower().replace("_", " ")
    if d.startswith("desc"):
        return col.desc_nulls_last() if "last" in d else col.desc_nulls_first()
    return col.asc_nulls_first() if "first" in d else col.asc_nulls_last()


def _warn_unpushable_order(index, order_by, limit) -> None:
    """The reference planner's check_topk_scan WARNING, text-for-text
    (topk-lower-text.out): emitted when a LIMIT query's ORDER BY
    columns cannot ride the TopK scan — a string sort key with no
    keyword-family fast index field whose name or source expression
    matches it.  Numeric / date / timestamp / boolean doc columns are
    fast by default (they sort by value, not by token), so they never
    trigger it.  Gated on the check_topk_scan GUC analog."""
    from sparksearch import config as _cfg
    if limit is None or not _cfg.get().check_topk_scan:
        return
    key = index.schema.key_field
    dtypes = dict(index.docs.dtypes)
    if len(order_by) > 5:
        # the reference TopK pushdown caps pathkeys at 5
        # (topk_validation.out Test 4) — more falls back to Normal+Sort
        import warnings
        tname = getattr(index, "table_name", "") or "?"
        warnings.warn(
            f"Query has LIMIT {limit} but is not using Top K scan "
            f"(using Normal instead). Reason: ORDER BY has "
            f"{len(order_by)} columns but Top K supports maximum 5. "
            "This may cause poor performance on large datasets. "
            "Remedies: Reduce ORDER BY columns to 5 or fewer. To "
            "disable this warning: SET paradedb.check_topk_scan = "
            f"false (table: {tname})", stacklevel=3)
        return

    def _pushable(c: str) -> bool:
        c = c.strip()
        if c in ("score", "doc_id", key):
            return True
        # IS [NOT] NULL expressions ride the base column's fast data
        # (issue #4751 / join_order_by_is_null.out)
        low = c.lower()
        for suffix in (" is not null", " is null"):
            if low.endswith(suffix):
                return _pushable(c[: -len(suffix)])
        dt = dtypes.get(c)
        if dt is not None and dt != "string":
            # numeric/date/timestamp/bool: fast by default — but
            # COMPOSITE columns (PG range types = struct<lower, upper,
            # ...>, arrays) have no fast-field representation and fall
            # back to Normal+Sort (issue_2688.out: ORDER BY tstzrange /
            # numrange warns; fast_fields_options.out: a range field
            # declared {"fast": true} STILL warns), and an explicit
            # ``{"fast": false}`` field config drops the column data
            # (fast_fields_options.out Test 6)
            if (dt.startswith("struct<") or dt.startswith("array<")
                    or dt.startswith("map<")):
                return False
            return index.schema.attr_fast(c)
        norm = c.replace(" ", "").lower()
        for f in index.schema.text_fields:
            if f.fast is False:
                continue
            # a text field's fast data stores the raw value when the
            # tokenizer is KEYWORD-FAMILY (implies fast raw storage) or
            # when the config says "fast": true EXPLICITLY — a merely
            # tokenized field without either cannot serve ORDER BY
            # (tokenizer_literal_normalized.out: bare unicode_words
            # warns; join_order_by_is_null.out: {"fast": true} under
            # the default tokenizer rides TopK silently)
            if (f.tokenizer not in ("keyword", "raw", "literal",
                                    "literal_normalized")
                    and f.fast is not True):
                continue
            # a fast text field's column stores its SOURCE expression's
            # raw value: ORDER BY rides it only when the sort expression
            # IS that stored value — a field indexed as
            # lower(description) serves ORDER BY lower(description), not
            # ORDER BY description (topk-lower-text.out's Normal+Sort)
            stored = (f.source or f.name).replace(" ", "").lower()
            if norm == stored:
                return True
        return False

    for c, _ in order_by:
        if not _pushable(c):
            import warnings
            tname = getattr(index, "table_name", "") or "?"
            warnings.warn(
                f"Query has LIMIT {limit} but is not using Top K scan "
                "(using Normal instead). Reason: ORDER BY columns cannot "
                "be pushed down to the index. This may cause poor "
                "performance on large datasets. Remedies: Ensure ORDER "
                "BY columns are indexed. Numeric columns are fast by "
                "default. For string columns, use pdb.literal tokenizer. "
                "To disable this warning: SET paradedb.check_topk_scan = "
                f"false (table: {tname})", stacklevel=3)
            return


def search(index, query, limit: int | None = None, offset: int = 0,
           order_by=None, columns=None, with_score: bool = True,
           score_alias: str = "score") -> DataFrame:
    """Execute a search query against an index.

    - ``query``: AST node or a query string (parsed against the default
      field, like ``body @@@ '...'``).
    - ``order_by``: list of (column, "asc"|"desc") where column may be
      "score" or any doc column; default = score desc, key asc
      (BM25 top-k with stable tiebreak).
    - ``columns``: display columns from the doc table (default: all).
    """
    key = index.schema.key_field
    node = _as_query(index, query)
    # PG name binding: bare ORDER BY score resolves to the TABLE column
    # when one exists and no score projection is selected; with the
    # projection selected (with_score) it is the search score
    score_is_doc = (not with_score) and "score" in index.docs.columns

    order_by = order_by or [("score", "desc"), ("doc_id", "asc")]

    # MaxScore prune (Block-MAX WAND analog): when the page is a
    # score-desc top-k, docs provably below the K-th score are never
    # scored — bit-identical results, fewer postings rows through the
    # aggregation (compile_query_topk documents the argument).  Any
    # disqualifying shape returns None and the plain plan runs.
    raw_scores = None
    if (limit is not None and not score_is_doc and order_by
            and order_by[0][0] == "score"
            and order_by[0][1].lower().replace("_", " ")
                .startswith("desc")):
        from sparksearch.query.compiler import compile_query_topk
        raw_scores = compile_query_topk(index, node, limit + offset)
    if raw_scores is None:
        raw_scores = compile_query(index, node)
    # the match-set score lives under an internal name so a DOC COLUMN
    # literally named "score" (legal in the reference; its index_sorting
    # suite sorts one) never collides with the projection
    scores = raw_scores.select("doc_id",
                               F.col("score").alias("__pdb_score"))
    _warn_unpushable_order(index, order_by, limit)
    doc_sort_cols = [c for c, _ in order_by
                     if c not in ("doc_id", key)
                     and (c != "score" or score_is_doc)]

    narrow = scores
    if doc_sort_cols:
        # sort keys may be SQL expressions over the doc row, e.g.
        # "lower(description)" (aliased_text_expression_topk_orderby.out)
        nd = index.docs.select(
            F.col(key).alias("doc_id"),
            *[(F.col(c) if c in index.docs.columns
               else F.expr(c)).alias(c) for c in doc_sort_cols])
        narrow = scores.join(nd, "doc_id")

    sort_exprs = []
    for c, direction in order_by:
        if c == key:
            col = F.col("doc_id")
        elif c == "score" and not score_is_doc:
            col = F.col("__pdb_score")
        else:
            col = F.col(c)
        sort_exprs.append(_dir(col, direction))

    if limit is not None:
        narrow = narrow.orderBy(*sort_exprs).limit(limit + offset)
    if offset:
        if limit is None:
            # Offset WITHOUT limit runs row_number() over an
            # unpartitioned window across the FULL match set — a
            # single-partition serialization at scale.  Keep it valid
            # (small/interactive result sets) but warn: keyset paging
            # (filter on the last seen sort key, the q_paging_keyset
            # pattern) is the scale path, or pass a limit so the window
            # input is pre-shrunk to limit+offset rows.
            import warnings
            warnings.warn(
                "search(offset=...) without limit sorts the full match "
                "set through one partition; use keyset paging or pass a "
                "limit for large result sets", stacklevel=2)
        # the bounded-limit case has already shrunk the input to
        # limit+offset rows, so the single-partition window is tiny
        w = W.orderBy(*sort_exprs)
        narrow = (narrow.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") > offset).drop("_rn"))

    out_cols = columns or [c for c in index.docs.columns]
    # alias the docs side: ``nd`` above shares its lineage, and the
    # final join must qualify doc columns (a doc column named "score"
    # is legal — index_sorting.rs sorts one) without tripping Spark's
    # ambiguous-self-join check
    docs = index.docs.alias("__pdb_docs")

    def _dcol(c):
        return F.col(f"__pdb_docs.`{c}`")

    sel_narrow = narrow.select(F.col("doc_id").alias("__sk_did"),
                               F.col("__pdb_score"))
    hits = (sel_narrow.join(docs, sel_narrow["__sk_did"] == _dcol(key))
            .drop("__sk_did"))
    final_sort = []
    for c, direction in order_by:
        if c == "score" and not score_is_doc:
            col = F.col("__pdb_score")
        elif c == "doc_id":
            col = _dcol(key)
        elif c in index.docs.columns:
            col = _dcol(c)
        else:
            col = F.expr(c)
        final_sort.append(_dir(col, direction))
    sel = [_dcol(c).alias(c) if c in index.docs.columns
           else F.expr(c).alias(c) for c in out_cols] + \
        ([F.col("__pdb_score").alias(score_alias)] if with_score else [])
    return hits.orderBy(*final_sort).select(*sel)


def count(index, query) -> int:
    """COUNT(*) of matching docs (AggregateScan count path)."""
    return compile_query(index, _as_query(index, query)).count()


def search_with_facets(index, query, limit: int = 10, offset: int = 0,
                       order_by=None, columns=None, facets: dict | None = None,
                       window_aggs: dict | None = None) -> dict:
    """One-call search page: top-k hits + match-set aggregates + facet
    buckets (the reference's Top K + ``COUNT(*) OVER ()`` + faceting
    page shape, topk-agg-facet.out).

    ``window_aggs`` maps output names to SQL aggregate expressions over
    the match set (the ``<agg> OVER ()`` analogs) — default
    ``{"total_count": "count(*)"}``.  ``facets`` is an ES-style
    aggregation request (aggs.run_aggs shape) over the matched docs.

    The match set (doc_id, score) is computed ONCE and persisted, so
    the top-k cut, the window aggregates, and every facet reuse it —
    the reference computes these in one scan; here one narrow cached
    frame feeds three small plans (hits: TakeOrderedAndProject;
    aggregates: partial-agg reduce; facets: per-level groupBy).
    """
    matched = compile_query(index, _as_query(index, query)).persist()
    try:
        # the page itself (search() recompiles the query; its scan is
        # the cheap top-k cut, while the EXPENSIVE full-match-set work
        # below reuses the persisted frame)
        hits = search(index, query, limit=limit, offset=offset,
                      order_by=order_by, columns=columns)
        rows = hits.collect()
        aggs_exprs = window_aggs or {"total_count": "count(*)"}
        need_docs = any(
            tok not in ("count(*)",) for tok in aggs_exprs.values())
        key = index.schema.key_field
        base = matched
        if need_docs or facets:
            docs = index.docs.select(
                F.col(key).alias("__swf_did"),
                *[c for c in index.docs.columns if c != key])
            base = matched.join(docs,
                                matched["doc_id"] == docs["__swf_did"]) \
                .drop("__swf_did")
        agg_row = base.agg(*[F.expr(e).alias(n)
                             for n, e in aggs_exprs.items()]).first()
        out = {"hits": rows,
               "aggregates": {n: agg_row[n] for n in aggs_exprs}}
        if facets:
            from sparksearch.aggs import run_aggs
            out["facets"] = run_aggs(base, facets,
                                     schema=index.schema)["aggregations"]
        return out
    finally:
        matched.unpersist()
