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


def _merge_spans(hits):
    """Merge overlapping/touching matched spans into maximal ranges —
    adjacent grams of one needle ('toot','ooth' for needle 'tooth' on an
    ngram field) highlight as ONE region, Tantivy's merged
    HighlightSections (keys_snippet_score.out: blue<b>tooth</b>)."""
    out: list = []
    for s, e in hits:
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def _render_fragment(text, hits, start_tag, end_tag, left, right):
    import html
    out, cur = [], left
    for s, e in hits:
        out.append(html.escape(text[cur:s]))
        out.append(start_tag + html.escape(text[s:e]) + end_tag)
        cur = e
    out.append(html.escape(text[cur:right]))
    return "".join(out)


def _all_fragments(text, spans, terms, start_tag, end_tag, max_chars,
                   allowed=None):
    """[(score, position, fragment)] — Tantivy SnippetGenerator
    fragmentation, verified against the reference's pg_regress
    ``snippets.out`` golden: fragments are cut SEQUENTIALLY at token
    boundaries from the document start (a fragment accumulates tokens
    while last_token.end − fragment_start ≤ max_chars; the token that
    would overflow starts the next fragment), the rendered text spans
    [first_token_start, last_token_end] (leading/trailing non-token
    chars dropped), fragments with zero matched terms are discarded, and
    fragment score = matched-occurrence count
    (projections/snippet.rs:358)."""
    if not spans:
        return []
    frags = []
    i, n = 0, len(spans)
    while i < n:
        start = spans[i][0]
        last_end = spans[i][1]
        hits = []
        j = i
        while j < n and spans[j][1] - start <= max_chars:
            if spans[j][2] in terms and (
                    allowed is None or (spans[j][0], spans[j][1]) in allowed):
                hits.append((spans[j][0], spans[j][1]))
            last_end = spans[j][1]
            j += 1
        if j == i:  # single token wider than the budget: emit it alone
            if spans[i][2] in terms and (
                    allowed is None or (spans[i][0], spans[i][1]) in allowed):
                hits.append((spans[i][0], spans[i][1]))
            last_end = spans[i][1]
            j = i + 1
        if hits:
            hits = _merge_spans(hits)
            frags.append((len(hits), start,
                          _render_fragment(text, hits, start_tag, end_tag,
                                           start, last_end)))
        i = j
    return frags


def _best_fragment(text, spans, terms, start_tag, end_tag, max_chars,
                   allowed=None):
    frags = _all_fragments(text, spans, terms, start_tag, end_tag, max_chars,
                           allowed)
    if not frags:
        return None
    return max(frags, key=lambda f: (f[0], -f[1]))[2]


def _check_occ_paging(occ_limit, occ_offset) -> None:
    """Reference argument validation (snippet_limit_offset.out):
    ``limit => -1`` errors with this exact message; offsets past the
    last occurrence are fine (NULL rows, no error)."""
    if occ_limit is not None and occ_limit < 0:
        raise ValueError("limit must not be negative")
    if occ_offset and occ_offset < 0:
        raise ValueError("offset must not be negative")


def _occurrence_slice(spans, tset, occ_limit, occ_offset):
    """Doc-order occurrence paging (the deprecated pdb.snippet
    limit/offset surface, snippet_limit_offset.out): select matched
    occurrences [offset : offset+limit]; None means no paging."""
    occs = [(a, b) for a, b, t in spans if t in tset]
    end = occ_offset + occ_limit if occ_limit is not None else None
    return occs[occ_offset:end]


def snippet_udf(terms: list, tokenizer: str = "default", opts: dict | None = None,
                lowercase: bool = True, start_tag: str = DEFAULT_START,
                end_tag: str = DEFAULT_END,
                max_chars: int = DEFAULT_MAX_CHARS,
                occ_limit: int | None = None, occ_offset: int = 0):
    """pandas UDF: text column → highlighted fragment (or NULL when no
    term matches).  ``occ_limit``/``occ_offset`` page over matched
    OCCURRENCES in document order (reference pdb.snippet "limit"/"offset"
    args, snippet_limit_offset.out): only the selected occurrences are
    highlighted, and a doc whose selection is empty yields NULL."""
    tset = set(terms)
    o = dict(opts or {})
    _check_occ_paging(occ_limit, occ_offset)
    paged = occ_limit is not None or occ_offset

    @F.pandas_udf(T.StringType())
    def _snip(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            spans = _token_spans(text, tokenizer, o, lowercase)
            allowed = None
            if paged:
                sel = _occurrence_slice(spans, tset, occ_limit, occ_offset)
                if not sel:
                    return None
                allowed = set(sel)
            return _best_fragment(text, spans, tset, start_tag, end_tag,
                                  max_chars, allowed)
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
            # offset past the last fragment → empty ARRAY (reference
            # pg_regress snippets.out prints `{}`, not NULL); only a
            # document with no matched term at all yields NULL
            return out[offset:end]
        return s.map(one)

    return _snips


def snippet_positions_udf(terms: list, tokenizer: str = "default",
                          opts: dict | None = None, lowercase: bool = True,
                          occ_limit: int | None = None, occ_offset: int = 0):
    """pandas UDF: text → array<struct<start int, end int>> char offsets of
    matched terms (pdb.snippet_positions); ``occ_limit``/``occ_offset``
    page occurrences in document order (snippet_limit_offset.out) —
    an empty selection yields NULL, like the reference."""
    tset = set(terms)
    o = dict(opts or {})
    _check_occ_paging(occ_limit, occ_offset)

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType())])))
    def _pos(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            spans = _token_spans(text, tokenizer, o, lowercase)
            sel = _occurrence_slice(spans, tset, occ_limit, occ_offset)
            return [{"start": a, "end": b} for a, b in sel] or None
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


def _snippet_source(index, field: str):
    """(text Column, analyzer FieldConfig) for a snippet target — plain
    text fields use the field column + its analyzer; JSON path refs like
    ``metadata.details.author.description`` extract the value with
    ``get_json_object`` and highlight with the json field's VALUE
    tokenizer (reference pg_regress snippet_json_01_basic.out:
    ``pdb.snippet(metadata_jsonb->'details'->'author'->>'description')``)."""
    try:
        cfg, prefix = index.schema.resolve(field)
    except KeyError:
        # snippet over a non-indexed column (issue_3212.out): the
        # reference errors — snippets need the index's analyzer
        raise KeyError(f"cannot generate snippet for field {field} "
                       "because it was not found in the index")
    if prefix:
        path = prefix[:-1]
        return (F.get_json_object(F.col(cfg.name), "$." + path),
                index.schema.value_analyzer(field))
    # TEXT[] fields render space-joined, same as they index
    # (pg_regress snippet_position_01_basic: pdb.snippet(titles))
    from pyspark.sql.types import ArrayType
    src = cfg.source or cfg.name
    try:
        if isinstance(index.docs.schema[src].dataType, ArrayType):
            return F.concat_ws(" ", F.col(src)), cfg
    except KeyError:
        pass
    return F.col(field), cfg


def with_snippet(index, hits_df, query, field: str,
                 start_tag: str = DEFAULT_START, end_tag: str = DEFAULT_END,
                 max_chars: int = DEFAULT_MAX_CHARS,
                 out_col: str = "snippet",
                 occ_limit: int | None = None, occ_offset: int = 0):
    """Add a snippet column to a top-k result (post-limit projection)."""
    col, cfg = _snippet_source(index, field)
    from sparksearch.query.search import _as_query
    terms = _query_terms(index, _as_query(index, query), field)
    udf = snippet_udf(terms, cfg.tokenizer, cfg.tokenizer_opts, cfg.lowercase,
                      start_tag, end_tag, max_chars, occ_limit, occ_offset)
    return hits_df.withColumn(out_col, udf(col))


def with_snippet_positions(index, hits_df, query, field: str,
                           out_col: str = "snippet_positions",
                           occ_limit: int | None = None, occ_offset: int = 0):
    """Add a char-offset span column (``pdb.snippet_positions``) to a
    top-k result; supports JSON path refs like the other projections."""
    col, cfg = _snippet_source(index, field)
    from sparksearch.query.search import _as_query
    terms = _query_terms(index, _as_query(index, query), field)
    udf = snippet_positions_udf(terms, cfg.tokenizer, cfg.tokenizer_opts,
                                cfg.lowercase, occ_limit, occ_offset)
    return hits_df.withColumn(out_col, udf(col))


def with_snippets(index, hits_df, query, field: str,
                  start_tag: str = DEFAULT_START, end_tag: str = DEFAULT_END,
                  max_chars: int = DEFAULT_MAX_CHARS,
                  limit: int | None = None, offset: int = 0,
                  sort_by: str = "score", out_col: str = "snippets"):
    """Add a multi-fragment snippets column (``pdb.snippets``) to a top-k
    result — post-limit projection, like the single-fragment variant."""
    col, cfg = _snippet_source(index, field)
    from sparksearch.query.search import _as_query
    terms = _query_terms(index, _as_query(index, query), field)
    udf = snippets_udf(terms, cfg.tokenizer, cfg.tokenizer_opts,
                       cfg.lowercase, start_tag, end_tag, max_chars,
                       limit, offset, sort_by)
    return hits_df.withColumn(out_col, udf(col))
