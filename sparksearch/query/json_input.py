"""The reference's JSON query-input surface: ``col @@@ '<json>'::jsonb``.

ParadeDB accepts a serialized ``SearchQueryInput`` anywhere a query
string is legal — ``WHERE id @@@ '{"boolean": {"must": [...]}}'::jsonb``
(complex_query_series_view.out; the same wire format appears in every
EXPLAIN's ``Tantivy Query:`` line).  :func:`from_json` parses that wire
format into this engine's AST.

Shape (serde ``rename_all = "snake_case"``, pg_search/src/query/mod.rs:
63-140 SearchQueryInput + pdb_query.rs:149-327 pdb::Query):

- unit variants serialize as bare strings (``"all"``, ``"empty"``);
- top-level combinators are single-key objects
  (``{"boolean": {...}}``, ``{"boost": {"query": ..., "factor": 2}}``);
- FIELDED leaf queries inline the field into the variant object
  (``{"term": {"field": "f", "value": 1}}`` —
  mod.rs:144-170 serialize_fielded_query shift-inserts ``field``);
- range bounds serialize as ``{"included": v}`` / ``{"excluded": v}`` /
  ``null`` for unbounded.
"""

from __future__ import annotations

import json as _json

from sparksearch.query import ast

_UNBOUNDED = object()


def _bound(b):
    """Decode a serde Bound: {"included"|"excluded": v} | null."""
    if b is None:
        return _UNBOUNDED, True
    if isinstance(b, dict):
        if "included" in b:
            return b["included"], True
        if "excluded" in b:
            return b["excluded"], False
    raise ValueError(f"unsupported range bound: {b!r}")


def _range_value(d: dict) -> ast.RangeValue:
    lo, lo_inc = _bound(d.get("lower_bound"))
    hi, hi_inc = _bound(d.get("upper_bound"))
    return ast.RangeValue(
        lower=None if lo is _UNBOUNDED else lo,
        upper=None if hi is _UNBOUNDED else hi,
        lower_inclusive=lo_inc, upper_inclusive=hi_inc)


def _score_bound_pair(pair):
    """ScoreFilter bounds: a (Bound<f32>, Bound<f32>) tuple —
    serialized as a 2-element array."""
    lo, _ = _bound(pair[0])
    hi, _ = _bound(pair[1])
    return (None if lo is _UNBOUNDED else lo,
            None if hi is _UNBOUNDED else hi)


def from_json(obj) -> ast.Query:
    """Parse the reference's JSON query wire format into an AST node.

    Accepts a dict (already-parsed JSON), a JSON string, or a bare
    unit-variant string (``"all"`` / ``"empty"``).  Raises
    ``ValueError`` on unknown variants, like the reference's serde
    error surfaced through the ``::jsonb`` cast.
    """
    if isinstance(obj, str):
        s = obj.strip()
        if s.startswith("{") or s.startswith('"'):
            return from_json(_json.loads(s))
        obj = s  # bare unit-variant name
    if isinstance(obj, str):
        unit = {"all": ast.All, "empty": ast.Empty}
        if obj in unit:
            return unit[obj]()
        raise ValueError(f"unsupported query input: {obj!r}")
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(f"expected a single-variant query object: {obj!r}")
    kind, v = next(iter(obj.items()))
    f = v.get("field") if isinstance(v, dict) else None

    # --- top-level combinators (SearchQueryInput, mod.rs:65-140) ---
    if kind == "boolean":
        return ast.Boolean(
            must=[from_json(q) for q in v.get("must", [])],
            should=[from_json(q) for q in v.get("should", [])],
            must_not=[from_json(q) for q in v.get("must_not", [])],
            minimum_should_match=v.get("minimum_should_match"))
    if kind == "boost":
        return ast.Boost(from_json(v["query"]), factor=v["factor"])
    if kind == "const_score":
        return ast.ConstScore(from_json(v["query"]), score=v["score"])
    if kind == "disjunction_max":
        return ast.DisjunctionMax(
            disjuncts=[from_json(q) for q in v["disjuncts"]],
            tie_breaker=v.get("tie_breaker") or 0.0)
    if kind == "score_filter":
        lo, hi = _score_bound_pair(v["bounds"][0])
        return ast.ScoreFilter(from_json(v["query"]),
                               min_score=lo, max_score=hi)
    if kind == "with_index":
        # {"with_index": {"oid": ..., "query": ...}} — the index
        # binding is resolved by the caller here; unwrap
        return from_json(v["query"])
    if kind == "heap_filter":
        preds = [e["heap_filter"] if isinstance(e, dict) else e
                 for e in v.get("field_filters", [])]
        q = from_json(v["indexed_query"])
        for p in preds:
            q = ast.HeapFilter(q, predicate=p)
        return q
    if kind == "parse" and f is None:
        return ast.Parse(v["query_string"],
                         lenient=bool(v.get("lenient")),
                         conjunction_mode=bool(v.get("conjunction_mode")))
    if kind == "more_like_this":
        doc = v.get("document") or []
        return ast.MoreLikeThis(
            field=None,
            document_id=v.get("key_value"),
            document_text=" ".join(str(val) for _, val in doc) or None,
            min_term_frequency=v.get("min_term_frequency"),
            min_doc_frequency=v.get("min_doc_frequency"),
            max_doc_frequency=v.get("max_doc_frequency"),
            max_query_terms=v.get("max_query_terms"),
            fields=v.get("fields"),
            min_word_length=v.get("min_word_length"),
            max_word_length=v.get("max_word_length"),
            stopwords=v.get("stopwords"),
            boost_factor=v.get("boost_factor"))
    if kind == "term_set" and f is None:
        # top-level TermSet carries (field, value) TermInputs
        # (mod.rs:811-814); group per field
        by_field: dict = {}
        for t in v["terms"]:
            by_field.setdefault(t["field"], []).append(t["value"])
        sets = [ast.TermSet(fld, vals) for fld, vals in by_field.items()]
        return sets[0] if len(sets) == 1 else ast.Boolean(should=sets)

    # --- fielded leaf queries (pdb::Query, pdb_query.rs:149-327) ---
    if f is None:
        raise ValueError(f"unsupported query input: {kind!r}")
    if kind == "all":
        return ast.All()
    if kind == "empty":
        return ast.Empty()
    if kind == "exists":
        return ast.Exists(f)
    if kind == "term":
        return ast.Term(f, v["value"])
    if kind == "term_set":
        return ast.TermSet(f, v["terms"])
    if kind == "match":
        return ast.Match(f, v["value"],
                         conjunction_mode=bool(v.get("conjunction_mode")),
                         distance=v.get("distance") or 0)
    if kind == "match_array":
        return ast.Match(f, " ".join(v["tokens"]),
                         conjunction_mode=bool(v.get("conjunction_mode")),
                         distance=v.get("distance") or 0)
    if kind in ("parse_with_field", "parse"):
        return ast.Parse(v["query_string"], field=f,
                         lenient=bool(v.get("lenient")),
                         conjunction_mode=bool(v.get("conjunction_mode")))
    if kind == "phrase":
        return ast.Phrase(f, v["phrases"], slop=v.get("slop") or 0)
    if kind == "phrase_array":
        return ast.Phrase(f, v["tokens"], slop=v.get("slop") or 0)
    if kind == "tokenized_phrase":
        return ast.TokenizedPhrase(f, v["phrase"], slop=v.get("slop") or 0)
    if kind == "phrase_prefix":
        return ast.PhrasePrefix(f, v["phrases"],
                                max_expansions=v.get("max_expansions") or 50)
    if kind == "fuzzy_term":
        return ast.Fuzzy(
            f, v["value"],
            distance=2 if v.get("distance") is None else v["distance"],
            prefix=bool(v.get("prefix")),
            transposition_cost_one=(
                True if v.get("transposition_cost_one") is None
                else bool(v["transposition_cost_one"])))
    if kind == "regex":
        return ast.Regex(f, v["pattern"])
    if kind == "regex_phrase":
        return ast.RegexPhrase(f, v["regexes"], slop=v.get("slop") or 0,
                               max_expansions=v.get("max_expansions") or 50)
    if kind == "range":
        rv = _range_value(v)
        return ast.Range(f, lower=rv.lower, upper=rv.upper,
                         lower_inclusive=rv.lower_inclusive,
                         upper_inclusive=rv.upper_inclusive)
    if kind == "range_term":
        return ast.RangeTerm(f, v["value"])
    if kind == "range_contains":
        return ast.RangeContains(f, _range_value(v))
    if kind == "range_intersects":
        return ast.RangeIntersects(f, _range_value(v))
    if kind == "range_within":
        return ast.RangeWithin(f, _range_value(v))
    if kind == "unclassified_string":
        # the pre-rewrite @@@ string form → ParseWithField, like the
        # reference's operator SUPPORT rewrite (pdb_query.rs:153-171)
        return ast.Parse(v["string"], field=f)
    if kind == "score_adjusted":
        # the ::pdb.boost(f)/::pdb.const(f) cast: the field rides the
        # wrapper; re-inject it into the inner variant before parsing
        inner = v["query"]
        if isinstance(inner, dict) and len(inner) == 1:
            ik, iv = next(iter(inner.items()))
            if isinstance(iv, dict) and "field" not in iv:
                inner = {ik: {**iv, "field": f}}
        elif isinstance(inner, str):
            inner = {inner: {"field": f}}
        return _score_adjusted({"query": inner, "score": v.get("score")})
    if kind == "proximity":
        return ast.Proximity(
            f, _prox_clause(v["left"]),
            _prox_distance(v["distance"])[0],
            _prox_clause(v["right"]),
            ordered=_prox_distance(v["distance"])[1])
    raise ValueError(f"unsupported query input: {kind!r}")


def _score_adjusted(v):
    """pdb::Query::ScoreAdjusted (pdb_query.rs:141-144,191-194): the
    ``::pdb.boost(f)`` / ``::pdb.const(f)`` cast form — wraps the inner
    query in Boost or ConstScore."""
    inner = from_json(v["query"])
    style = v.get("score")
    if style is None:
        return inner
    if "boost" in style:
        return ast.Boost(inner, factor=style["boost"])
    if "const" in style:
        return ast.ConstScore(inner, score=style["const"])
    raise ValueError(f"unsupported score adjust style: {style!r}")


def _prox_clause(c):
    """ProximityClause serde (proximity/mod.rs:36-49): a term string
    ({"term": w}), a regex, a clause list, or a nested proximity."""
    if isinstance(c, str):
        return c
    if "term" in c:
        return c["term"]
    if "regex" in c:
        return ast.ProxRegex(c["regex"]["pattern"],
                             max_expansions=c["regex"].get(
                                 "max_expansions", 50))
    if "clauses" in c:
        return [_prox_clause(x) for x in c["clauses"]]
    if "proximity" in c:
        p = c["proximity"]
        dist, ordered = _prox_distance(p["distance"])
        return ast.Proximity(None, _prox_clause(p["left"]), dist,
                             _prox_clause(p["right"]), ordered=ordered)
    raise ValueError(f"unsupported proximity clause: {c!r}")


def _prox_distance(d):
    """ProximityDistance serde: {"in_order": n} | {"any_order": n}."""
    if "in_order" in d:
        return d["in_order"], True
    if "any_order" in d:
        return d["any_order"], False
    raise ValueError(f"unsupported proximity distance: {d!r}")


def _clause_json(c):
    if isinstance(c, str):
        return {"term": c}
    if isinstance(c, ast.ProxRegex):
        return {"regex": {"pattern": c.pattern,
                          "max_expansions": c.max_expansions}}
    if isinstance(c, list):
        return {"clauses": [_clause_json(x) for x in c]}
    if isinstance(c, ast.Proximity):
        return {"proximity": {
            "left": _clause_json(c.left),
            "distance": {"in_order" if c.ordered else "any_order":
                         c.distance},
            "right": _clause_json(c.right)}}
    raise ValueError(f"cannot serialize proximity clause: {c!r}")


def _bound_json(value, inclusive):
    if value is None:
        return None
    return {"included" if inclusive else "excluded": value}


def to_json(q: ast.Query) -> dict:
    """Serialize an AST node to the reference's JSON wire format — the
    inverse of :func:`from_json` (``from_json(to_json(q)) == q``), and
    the same shape the reference prints in EXPLAIN ``Tantivy Query:``
    lines.  Optional params are emitted only when set (serde
    ``skip_serializing_if`` on most variants)."""
    A = ast
    if isinstance(q, A.All):
        return "all"
    if isinstance(q, A.Empty):
        return "empty"
    if isinstance(q, A.Boolean):
        v: dict = {}
        if q.must:
            v["must"] = [to_json(x) for x in q.must]
        if q.should:
            v["should"] = [to_json(x) for x in q.should]
        if q.must_not:
            v["must_not"] = [to_json(x) for x in q.must_not]
        if q.minimum_should_match is not None:
            v["minimum_should_match"] = q.minimum_should_match
        return {"boolean": v}
    if isinstance(q, A.Boost):
        return {"boost": {"query": to_json(q.query), "factor": q.factor}}
    if isinstance(q, A.ConstScore):
        return {"const_score": {"query": to_json(q.query),
                                "score": q.score}}
    if isinstance(q, A.DisjunctionMax):
        return {"disjunction_max": {
            "disjuncts": [to_json(x) for x in q.disjuncts],
            "tie_breaker": q.tie_breaker or None}}
    if isinstance(q, A.ScoreFilter):
        return {"score_filter": {
            "bounds": [[_bound_json(q.min_score, True),
                        _bound_json(q.max_score, True)]],
            "query": to_json(q.query)}}
    if isinstance(q, A.HeapFilter):
        return {"heap_filter": {
            "indexed_query": to_json(q.query),
            "field_filters": [{"heap_filter": q.predicate}]}}
    if isinstance(q, A.Parse) and q.field is None:
        return {"parse": {"query_string": q.query_string,
                          "lenient": q.lenient or None,
                          "conjunction_mode": q.conjunction_mode or None}}
    if isinstance(q, A.Parse):
        return {"parse_with_field": {
            "field": q.field, "query_string": q.query_string,
            "lenient": q.lenient or None,
            "conjunction_mode": q.conjunction_mode or None}}
    if isinstance(q, A.Exists):
        return {"exists": {"field": q.field}}
    if isinstance(q, A.Term):
        return {"term": {"field": q.field, "value": q.value}}
    if isinstance(q, A.TermSet):
        return {"term_set": {"field": q.field, "terms": list(q.terms)}}
    if isinstance(q, A.Match):
        return {"match": {"field": q.field, "value": q.value,
                          "tokenizer": None,
                          "distance": q.distance or None,
                          "transposition_cost_one": None, "prefix": None,
                          "conjunction_mode": q.conjunction_mode or None}}
    if isinstance(q, A.TokenizedPhrase):
        return {"tokenized_phrase": {"field": q.field, "phrase": q.phrase,
                                     "slop": q.slop or None}}
    if isinstance(q, A.RegexPhrase):
        return {"regex_phrase": {"field": q.field,
                                 "regexes": list(q.regexes),
                                 "slop": q.slop or None,
                                 "max_expansions": q.max_expansions}}
    if isinstance(q, A.PhrasePrefix):
        return {"phrase_prefix": {"field": q.field,
                                  "phrases": list(q.phrases),
                                  "max_expansions": q.max_expansions}}
    if isinstance(q, A.Phrase):
        return {"phrase": {"field": q.field, "phrases": list(q.phrases),
                           "slop": q.slop or None}}
    if isinstance(q, A.Fuzzy):
        return {"fuzzy_term": {
            "field": q.field, "value": q.value, "distance": q.distance,
            "transposition_cost_one": q.transposition_cost_one,
            "prefix": q.prefix or None}}
    if isinstance(q, A.Regex):
        return {"regex": {"field": q.field, "pattern": q.pattern}}
    if isinstance(q, A.Range):
        return {"range": {
            "field": q.field,
            "lower_bound": _bound_json(q.lower, q.lower_inclusive),
            "upper_bound": _bound_json(q.upper, q.upper_inclusive)}}
    if isinstance(q, A.RangeTerm):
        return {"range_term": {"field": q.field, "value": q.value}}
    if isinstance(q, (A.RangeContains, A.RangeIntersects, A.RangeWithin)):
        kind = {A.RangeContains: "range_contains",
                A.RangeIntersects: "range_intersects",
                A.RangeWithin: "range_within"}[type(q)]
        rv = q.value
        return {kind: {
            "field": q.field,
            "lower_bound": _bound_json(rv.lower, rv.lower_inclusive),
            "upper_bound": _bound_json(rv.upper, rv.upper_inclusive)}}
    if isinstance(q, A.Proximity):
        return {"proximity": {
            "field": q.field,
            "left": _clause_json(q.left),
            "distance": {"in_order" if q.ordered else "any_order":
                         q.distance},
            "right": _clause_json(q.right)}}
    if isinstance(q, A.MoreLikeThis):
        return {"more_like_this": {
            "min_doc_frequency": q.min_doc_frequency,
            "max_doc_frequency": q.max_doc_frequency,
            "min_term_frequency": q.min_term_frequency,
            "max_query_terms": q.max_query_terms,
            "min_word_length": q.min_word_length,
            "max_word_length": q.max_word_length,
            "boost_factor": q.boost_factor,
            "stopwords": q.stopwords,
            "document": ([[q.field or "", q.document_text]]
                         if q.document_text is not None else None),
            "key_value": q.document_id,
            # a single-field MLT restricts through the fields list on
            # the wire (the reference's fielded form)
            "fields": (q.fields if q.fields is not None
                       else ([q.field] if q.field else None))}}
    raise ValueError(f"cannot serialize query node: {type(q).__name__}")
