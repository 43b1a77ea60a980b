"""Mini query-string parser — the Tantivy query mini-language subset the
reference exposes through ``field @@@ 'q'`` / ``pdb.Parse``
(pg_search/src/query/pdb_query.rs:229-240; Tantivy QueryParser semantics).

Supported: bare terms (tokenized with the target field's analyzer; a
single input word that tokenizes to several tokens becomes a phrase, like
Tantivy), ``"quoted phrases"`` with ``~slop``, ``term~d`` fuzzy,
``term^boost``, trailing-wildcard ``term*`` prefix, ``/regex/``,
``field:...`` targeting (incl. ``field:(grouped terms)``), ``+must`` /
``-must_not``, ``AND`` / ``OR`` / ``NOT``, parentheses, and ranges
``[a TO b]`` / ``{a TO b}`` / ``>=v >v <=v <v``.

Default combination is OR (should); ``conjunction_mode`` switches the
implicit operator to AND — matching ParseWithField's flag.
"""

from __future__ import annotations

import re

from sparksearch.query import ast
from sparksearch.analysis import py_analyze, py_tokenize

_TOKEN_RE = re.compile(
    r"""\s+
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<op>\b(?:AND|OR|NOT|TO)\b)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<quoted>"[^"]*"(?:~\d+)?(?:\^[\d.]+)?)
      | (?P<regex>/(?:[^/\\]|\\.)*/)
      | (?P<lbrack>[\[\{])
      | (?P<rbrack>[\]\}])
      | (?P<word>[^\s()\[\]{}"]+)
    """,
    re.VERBOSE,
)


class QueryParseError(ValueError):
    pass


def _lex(s: str) -> list:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise QueryParseError(f"cannot lex query at {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind:
            out.append((kind, m.group(kind)))
    return out


class _Parser:
    def __init__(self, tokens, default_field, index_schema, conjunction_mode):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.schema = index_schema
        self.conj = conjunction_mode

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # expr := andblock (OR andblock)*
    def parse_expr(self, field):
        parts = [self.parse_andblock(field)]
        while self.peek() == ("op", "OR"):
            self.next()
            parts.append(self.parse_andblock(field))
        if len(parts) == 1:
            return parts[0]
        return ast.Boolean(should=[self._resolve(p) for p in parts])

    @staticmethod
    def _resolve(p):
        if isinstance(p, _Neg):
            return ast.Boolean(must=[ast.All()], must_not=[p.q])
        return p

    # andblock := unitseq (AND unitseq)*
    def parse_andblock(self, field):
        units = [self.parse_unitseq(field)]
        while self.peek() == ("op", "AND"):
            self.next()
            units.append(self.parse_unitseq(field))
        if len(units) == 1:
            return units[0]
        must, must_not = [], []
        for u in units:
            (must_not if isinstance(u, _Neg) else must).append(
                u.q if isinstance(u, _Neg) else u)
        if not must:
            must = [ast.All()]
        return ast.Boolean(must=must, must_not=must_not)

    # unitseq := signed+   (adjacent clauses, implicit operator)
    def parse_unitseq(self, field):
        signed = []
        while True:
            kind, _ = self.peek()
            if kind in (None, "rparen") or self.peek() in (("op", "AND"), ("op", "OR")):
                break
            signed.append(self.parse_signed(field))
        if not signed:
            raise QueryParseError("empty clause")
        if len(signed) == 1:
            s = signed[0]
            if isinstance(s, _Signed):
                return s.q if s.occ == "must" else _Neg(s.q)
            return s
        must, should, must_not = [], [], []
        for occ, q in ((s.occ, s.q) if isinstance(s, _Signed) else
                       ("must_not", s.q) if isinstance(s, _Neg) else
                       (None, s) for s in signed):
            if occ == "must":
                must.append(q)
            elif occ == "must_not":
                must_not.append(q)
            elif self.conj:
                must.append(q)
            else:
                should.append(q)
        if must_not and not (must or should):
            must = [ast.All()]
        return ast.Boolean(must=must, should=should, must_not=must_not)

    def parse_signed(self, field):
        kind, val = self.peek()
        if kind == "plus":
            self.next()
            return _Signed("must", self.parse_atom(field))
        if kind == "minus":
            self.next()
            return _Signed("must_not", self.parse_atom(field))
        if (kind, val) == ("op", "NOT"):
            self.next()
            return _Neg(self.parse_atom(field))
        return self.parse_atom(field)

    def parse_atom(self, field):
        kind, val = self.next()
        if kind == "lparen":
            inner = self.parse_expr(field)
            if self.next()[0] != "rparen":
                raise QueryParseError("unbalanced parens")
            return self._postfix(inner)
        if kind == "quoted":
            return self._quoted(field, val)
        if kind == "regex":
            return ast.Regex(field, val[1:-1])
        if kind == "lbrack":
            return self._range(field, val)
        if kind == "word" and val == "IN" and self.peek() == ("lbrack", "["):
            # Tantivy set syntax ``IN [a b c]`` → term_set
            # (mixed_fast_fields_bug.out 'IN [alpha beta gamma]')
            return self._in_set(field)
        if kind == "word":
            return self._word(field, val)
        if (kind, val) == ("op", "NOT"):
            return _Neg(self.parse_atom(field))
        raise QueryParseError(f"unexpected token {val!r}")

    def _postfix(self, q):
        # ^boost after a group comes through as a word token "^2"
        kind, val = self.peek()
        if kind == "word" and val.startswith("^"):
            self.next()
            return ast.Boost(q, float(val[1:]))
        return q

    def _quoted(self, field, raw):
        m = re.match(r'"([^"]*)"(?:~(\d+))?(?:\^([\d.]+))?$', raw)
        body, slop, boost = m.group(1), m.group(2), m.group(3)
        cfg = self.schema.value_analyzer(field)
        # the FULL analyzer chain, filters included (Tantivy's query
        # parser runs the field's token stream over query text, so a
        # stemmed/folded index is queried with stemmed/folded terms —
        # ascii_folding_filter.out 'cafe' and 'café' both match)
        toks = [t for t, _ in py_analyze(body, cfg)]
        if not toks:
            q = ast.Empty()
        elif len(toks) == 1:
            q = ast.Term(field, toks[0])
        else:
            q = ast.Phrase(field, toks, slop=int(slop or 0),
                           implicit=True)
        return ast.Boost(q, float(boost)) if boost else q

    def _in_set(self, field):
        """``IN [v1 v2 ...]`` — whitespace-separated raw set values;
        each normalizes through the field config at compile time."""
        self.next()  # consume the [
        vals = []
        while True:
            kind, val = self.next()
            if kind is None:
                raise QueryParseError("unterminated IN set")
            if kind == "rbrack":
                if val != "]":
                    raise QueryParseError("IN set must close with ]")
                break
            if kind == "word":
                vals.append(val)
            elif kind == "quoted":
                vals.append(val.split('"')[1])
            else:
                raise QueryParseError(
                    f"unexpected token in IN set: {val!r}")
        return ast.TermSet(field, vals)

    def _range(self, field, open_br):
        lo_inc = open_br == "["
        vals = []
        while True:
            kind, val = self.next()
            if kind is None:
                raise QueryParseError("unterminated range")
            if kind == "rbrack":
                hi_inc = val == "]"
                break
            if (kind, val) == ("op", "TO"):
                continue
            vals.append(val)
        if len(vals) != 2:
            raise QueryParseError(f"range needs two bounds, got {vals}")
        lo = None if vals[0] == "*" else _literal(vals[0])
        hi = None if vals[1] == "*" else _literal(vals[1])
        return ast.Range(field, lo, hi, lower_inclusive=lo_inc, upper_inclusive=hi_inc)

    def _word(self, field, w):
        # field prefix — only when it names an actual column
        m = re.match(r"([A-Za-z_][\w.]*):(.*)$", w)
        if m:
            fld, rest = m.group(1), m.group(2)
            if rest == "" or rest is None:
                # field:(...) or field:"..." or field:[...]
                sub = _Parser(self.toks, fld, self.schema, self.conj)
                sub.i = self.i
                q = sub.parse_atom(fld)
                self.i = sub.i
                return q
            return self._word_in_field(fld, rest)
        return self._word_in_field(field, w)

    def _word_in_field(self, field, w):
        # comparisons
        for op, kw in ((">=", dict(lower_inclusive=True)), ("<=", dict(upper_inclusive=True)),
                       (">", dict(lower_inclusive=False)), ("<", dict(upper_inclusive=False))):
            if w.startswith(op):
                v = _literal(w[len(op):])
                if op in (">", ">="):
                    return ast.Range(field, lower=v, **kw)
                return ast.Range(field, upper=v, **kw)
        boost = None
        m = re.match(r"(.*)\^([\d.]+)$", w)
        if m:
            w, boost = m.group(1), float(m.group(2))
        fuzzy = None
        m = re.match(r"(.*?)~(\d*)$", w)
        if m:
            w, fuzzy = m.group(1), int(m.group(2) or 2)
        prefix = False
        if w.endswith("*") and len(w) > 1:
            w, prefix = w[:-1], True

        try:
            cfg = self.schema.value_analyzer(field)
        except KeyError:
            # unindexed column → constant-score attribute equality
            q = ast.Term(field, _literal(w))
            return ast.Boost(q, boost) if boost else q
        toks = [t for t, _ in py_analyze(w, cfg)]
        if fuzzy is not None:
            q = ast.Fuzzy(field, toks[0] if toks else w, distance=fuzzy)
        elif prefix:
            q = ast.PhrasePrefix(field, toks or [w.lower()])
        elif not toks:
            q = ast.Empty()
        elif len(toks) == 1:
            q = ast.Term(field, toks[0])
        else:
            # multi-token single word ("high-resolution") → phrase, Tantivy-style
            q = ast.Phrase(field, toks, implicit=True)
        return ast.Boost(q, boost) if boost else q


class _Signed:
    def __init__(self, occ, q):
        self.occ, self.q = occ, q


class _Neg:
    def __init__(self, q):
        self.q = q


def _literal(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return s


def _all_clauses_empty(node) -> bool:
    """True when every leaf of the parsed tree analyzed away to Empty —
    e.g. a query made ONLY of stopwords under a stopwords_language
    filter (tokenizer-stopwords-language.out)."""
    if isinstance(node, ast.Empty):
        return True
    if isinstance(node, ast.Boolean):
        kids = list(node.must) + list(node.should) + list(node.must_not)
        return bool(kids) and all(_all_clauses_empty(k) for k in kids)
    if isinstance(node, (ast.Boost, ast.ConstScore)):
        return _all_clauses_empty(node.query)
    return False


def parse_query(q: str, default_field: str, index_schema, lenient: bool = False,
                conjunction_mode: bool = False):
    """Parse a query string into an AST rooted at the default field."""
    try:
        toks = _lex(q)
        if not toks:
            return ast.Empty()
        p = _Parser(toks, default_field, index_schema, conjunction_mode)
        out = p.parse_expr(default_field)
        if p.i != len(p.toks):
            raise QueryParseError(f"trailing tokens: {p.toks[p.i:]}")
        if isinstance(out, _Neg):
            out = ast.Boolean(must=[ast.All()], must_not=[out.q])
        if _all_clauses_empty(out):
            # every word analyzed away (all stopwords): Tantivy's query
            # parser rejects the clause-less rewrite, error text-for-text
            # (tokenizer-stopwords-language.out)
            raise QueryParseError(
                f"could not parse query string '{default_field}:({q})'. "
                "make sure to use column:term pairs, and to capitalize "
                "AND/OR.")
        return out
    except QueryParseError:
        if lenient:
            # lenient mode: strip syntax chars and match remaining words
            words = re.findall(r"[\w]+", q)
            return ast.Match(default_field, " ".join(words))
        raise
