"""Snippet / highlight projections.

Reference: ``pdb.snippet(col, start_tag, end_tag, max_num_chars)``,
``pdb.snippets``, ``pdb.snippet_positions``
(pg_search/src/postgres/customscan/basescan/projections/snippet.rs:342-520;
defaults ``<b>``/``</b>``, 150 chars at :33).

Implementation: an Arrow pandas UDF re-tokenizes the matched document text
(same analyzer as the index) and wraps matched token spans — the reference
does the same re-analysis at projection time, so this stays a
post-processing step over the final K rows (late materialization: never
run over the full corpus, only over top-k output).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from sparksearch.analysis import py_tokenize

DEFAULT_START = "<b>"
DEFAULT_END = "</b>"
DEFAULT_MAX_CHARS = 150


def _token_spans(text: str, tokenizer: str, opts: dict, lowercase: bool):
    """[(start, end, token)] character spans of analyzer tokens."""
    if not text:
        return []
    spans = []
    # default/simple/unicode_words/whitespace tokenizers are all substring
    # tokenizers — locate each token occurrence left-to-right
    toks = py_tokenize(text, tokenizer, opts, lowercase)
    hay = text.lower() if lowercase else text
    pos = 0
    for t in toks:
        i = hay.find(t, pos)
        if i < 0:
            i = hay.find(t)
            if i < 0:
                continue
        spans.append((i, i + len(t), t))
        pos = i + len(t)
    return spans


def _render_fragment(text, spans, terms, start_tag, end_tag, left, right):
    frag_hits = [(s, e) for s, e, t in spans
                 if t in terms and s >= left and e <= right]
    out, cur = [], left
    for s, e in frag_hits:
        out.append(text[cur:s])
        out.append(start_tag + text[s:e] + end_tag)
        cur = e
    out.append(text[cur:right])
    return "".join(out)


def _fragment_windows(text, hits, max_chars):
    """Greedy non-overlapping hit windows: each fragment starts at the
    first uncovered hit (extended left to a whitespace boundary) and spans
    max_chars. Returns [(n_hits, start, left, right)]."""
    wins = []
    i = 0
    while i < len(hits):
        w0 = hits[i][0]
        left = max(0, w0 - 20)
        while left > 0 and not text[left - 1].isspace():
            left -= 1
        right = min(len(text), left + max_chars)
        n = sum(1 for h in hits if left <= h[0] and h[1] <= right)
        wins.append((n, w0, left, right))
        while i < len(hits) and hits[i][1] <= right:
            i += 1
    return wins


def _all_fragments(text, spans, terms, start_tag, end_tag, max_chars):
    """[(score, position, fragment)] for every hit window.  Fragment score
    = number of matched term occurrences (the reference scores fragments
    by summed term scores via Tantivy's SnippetGenerator,
    projections/snippet.rs:358; hit count is the analog over one field)."""
    hits = [s for s in spans if s[2] in terms]
    if not hits:
        return []
    return [(n, left, _render_fragment(text, spans, terms, start_tag,
                                       end_tag, left, right))
            for n, _w0, left, right in _fragment_windows(text, hits, max_chars)]


def _best_fragment(text, spans, terms, start_tag, end_tag, max_chars):
    frags = _all_fragments(text, spans, terms, start_tag, end_tag, max_chars)
    if not frags:
        return None
    return max(frags, key=lambda f: (f[0], -f[1]))[2]


def snippet_udf(terms: list, tokenizer: str = "default", opts: dict | None = None,
                lowercase: bool = True, start_tag: str = DEFAULT_START,
                end_tag: str = DEFAULT_END,
                max_chars: int = DEFAULT_MAX_CHARS):
    """pandas UDF: text column → highlighted fragment (or NULL when no
    term matches)."""
    tset = set(terms)
    o = dict(opts or {})

    @F.pandas_udf(T.StringType())
    def _snip(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            spans = _token_spans(text, tokenizer, o, lowercase)
            return _best_fragment(text, spans, tset, start_tag, end_tag,
                                  max_chars)
        return s.map(one)

    return _snip


def snippets_udf(terms: list, tokenizer: str = "default",
                 opts: dict | None = None, lowercase: bool = True,
                 start_tag: str = DEFAULT_START, end_tag: str = DEFAULT_END,
                 max_chars: int = DEFAULT_MAX_CHARS,
                 limit: int | None = None, offset: int = 0,
                 sort_by: str = "score"):
    """pandas UDF: text → array<string> of highlighted fragments
    (``pdb.snippets``, projections/snippet.rs:358): every hit window,
    sorted by fragment score desc (``sort_by='score'``) or document
    position (``sort_by='position'``), with limit/offset applied."""
    tset = set(terms)
    o = dict(opts or {})

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _snips(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            spans = _token_spans(text, tokenizer, o, lowercase)
            frags = _all_fragments(text, spans, tset, start_tag, end_tag,
                                   max_chars)
            if not frags:
                return None
            if sort_by == "position":
                frags.sort(key=lambda f: f[1])
            else:
                frags.sort(key=lambda f: (-f[0], f[1]))
            out = [f[2] for f in frags]
            end = offset + limit if limit is not None else None
            return out[offset:end] or None
        return s.map(one)

    return _snips


def snippet_positions_udf(terms: list, tokenizer: str = "default",
                          opts: dict | None = None, lowercase: bool = True):
    """pandas UDF: text → array<struct<start int, end int>> char offsets of
    matched terms (pdb.snippet_positions)."""
    tset = set(terms)
    o = dict(opts or {})

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType())])))
    def _pos(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            return [{"start": a, "end": b}
                    for a, b, t in _token_spans(text, tokenizer, o, lowercase)
                    if t in tset] or None
        return s.map(one)

    return _pos


def _query_terms(index, query, field: str) -> list:
    """Terms of the query that target ``field`` (for highlight matching)."""
    from sparksearch.query import ast
    from sparksearch.query.parser import parse_query
    out = []

    def walk(n):
        if isinstance(n, ast.Term) and n.field == field and isinstance(n.value, str):
            out.append(n.value.lower())
        elif isinstance(n, (ast.Phrase, ast.PhrasePrefix)) and n.field == field:
            out.extend(t.lower() for t in n.phrases)
        elif isinstance(n, ast.Match) and n.field == field:
            out.extend(py_tokenize(n.value))
        elif isinstance(n, ast.Parse):
            walk(parse_query(n.query_string,
                             n.field or index.schema.default_field,
                             index.schema, n.lenient, n.conjunction_mode))
        elif isinstance(n, ast.Boolean):
            for c in n.must + n.should:
                walk(c)
        elif hasattr(n, "query"):
            walk(n.query)
        elif hasattr(n, "disjuncts"):
            for c in n.disjuncts:
                walk(c)
    walk(query)
    return sorted(set(out))


def with_snippet(index, hits_df, query, field: str,
                 start_tag: str = DEFAULT_START, end_tag: str = DEFAULT_END,
                 max_chars: int = DEFAULT_MAX_CHARS,
                 out_col: str = "snippet"):
    """Add a snippet column to a top-k result (post-limit projection)."""
    cfg = index.schema.field(field)
    from sparksearch.query.search import _as_query
    terms = _query_terms(index, _as_query(index, query), field)
    udf = snippet_udf(terms, cfg.tokenizer, cfg.tokenizer_opts, cfg.lowercase,
                      start_tag, end_tag, max_chars)
    return hits_df.withColumn(out_col, udf(F.col(field)))


def with_snippets(index, hits_df, query, field: str,
                  start_tag: str = DEFAULT_START, end_tag: str = DEFAULT_END,
                  max_chars: int = DEFAULT_MAX_CHARS,
                  limit: int | None = None, offset: int = 0,
                  sort_by: str = "score", out_col: str = "snippets"):
    """Add a multi-fragment snippets column (``pdb.snippets``) to a top-k
    result — post-limit projection, like the single-fragment variant."""
    cfg = index.schema.field(field)
    from sparksearch.query.search import _as_query
    terms = _query_terms(index, _as_query(index, query), field)
    udf = snippets_udf(terms, cfg.tokenizer, cfg.tokenizer_opts,
                       cfg.lowercase, start_tag, end_tag, max_chars,
                       limit, offset, sort_by)
    return hits_df.withColumn(out_col, udf(F.col(field)))
