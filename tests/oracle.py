"""Brute-force pure-python search oracle for differential testing.

Evaluates the same query AST over a list of row-dicts with naive loops —
the analog of the reference's querygen differential suite, which compares
the custom scan against vanilla Postgres execution of the same query
(/root/reference/tests/tests/qgen.rs:17-60, compare_outcome
querygen/mod.rs:687-766).
"""

from __future__ import annotations

import math
import re

from sparksearch.analysis import py_tokenize
from sparksearch.query import ast
from sparksearch.scoring import bm25_py, idf as _idf, quantize_len


class PyIndex:
    def __init__(self, rows: list, key: str, schema):
        self.rows = rows
        self.key = key
        self.schema = schema
        self.toks = {}      # (doc, field) -> [tokens]
        self.dfs = {}       # (field, term) -> df
        self.avg = {}
        for cfg in schema.text_fields:
            total = 0
            for r in rows:
                ts = py_tokenize(r.get(cfg.name), cfg.tokenizer,
                                 cfg.tokenizer_opts, cfg.lowercase)
                self.toks[(r[key], cfg.name)] = ts
                total += len(ts)
                for t in set(ts):
                    self.dfs[(cfg.name, t)] = self.dfs.get((cfg.name, t), 0) + 1
            self.avg[cfg.name] = total / max(len(rows), 1)
        self.n = len(rows)

    def norm(self, field, v):
        # raw needles — the reference's value_to_term is
        # Term::from_field_text verbatim (query/mod.rs:1660); case
        # normalization happens only in Match/Parse analysis
        cfg, prefix = self.schema.resolve(field)
        if isinstance(v, str) and prefix:
            v = prefix + v
        return v

    def real_field(self, field):
        return self.schema.resolve(field)[0].name

    def term_score(self, doc, field, term):
        ts = self.toks[(doc, field)]
        tf = ts.count(term)
        if tf == 0:
            return None
        return bm25_py(tf, len(ts), self.n, self.dfs[(field, term)], self.avg[field])

    def dictionary(self, field):
        return sorted(t for (f, t) in self.dfs if f == field)


def evaluate(pidx: PyIndex, node) -> dict:
    """Return {doc_id: score} of matching docs."""
    rows, key = pidx.rows, pidx.key

    if isinstance(node, ast.All):
        return {r[key]: 1.0 for r in rows}
    if isinstance(node, ast.Empty):
        return {}
    if isinstance(node, ast.Term):
        try:
            v = pidx.norm(node.field, node.value)
        except KeyError:
            # unindexed attribute → constant-score filter, like the compiler
            return {r[key]: 1.0 for r in rows if r.get(node.field) == node.value}
        if not isinstance(v, str):
            return {r[key]: 1.0 for r in rows if r.get(node.field) == v}
        fld = pidx.real_field(node.field)
        out = {}
        for r in rows:
            s = pidx.term_score(r[key], fld, v)
            if s is not None:
                out[r[key]] = s
        return out
    if isinstance(node, ast.TermSet):
        terms = {pidx.norm(node.field, t) for t in node.terms}
        return {r[key]: 1.0 for r in rows
                if terms & set(pidx.toks[(r[key], node.field)])}
    if isinstance(node, ast.Match):
        cfg = pidx.schema.field(node.field)
        toks = py_tokenize(node.value, cfg.tokenizer, cfg.tokenizer_opts, cfg.lowercase)
        if not toks:
            return {}
        leaves = [ast.Fuzzy(node.field, t, distance=node.distance) if node.distance
                  else ast.Term(node.field, t) for t in toks]
        b = ast.Boolean(must=leaves) if node.conjunction_mode else ast.Boolean(should=leaves)
        return evaluate(pidx, b)
    if isinstance(node, ast.Range):
        out = {}
        for r in rows:
            v = r.get(node.field)
            if v is None:
                continue
            ok = True
            if node.lower is not None:
                ok = ok and (v >= node.lower if node.lower_inclusive else v > node.lower)
            if node.upper is not None:
                ok = ok and (v <= node.upper if node.upper_inclusive else v < node.upper)
            if ok:
                out[r[key]] = 1.0
        return out
    if isinstance(node, ast.Exists):
        return {r[key]: 1.0 for r in rows if r.get(node.field) is not None}
    if isinstance(node, ast.Fuzzy):
        # constant score 1.0 per matching doc (Tantivy FuzzyTermQuery
        # is an AutomatonWeight/ConstScorer — score_anti_join.out)
        v = pidx.norm(node.field, node.value)
        matched = [t for t in pidx.dictionary(node.field)
                   if _lev_ok(t, v, node.distance, node.prefix)]
        out = {}
        for r in rows:
            if any(pidx.term_score(r[key], node.field, t)
                   for t in matched):
                out[r[key]] = 1.0
        return out
    if isinstance(node, ast.Regex):
        pat = re.compile(f"^(?:{node.pattern})$")
        matched = {t for t in pidx.dictionary(node.field) if pat.match(t)}
        return {r[key]: 1.0 for r in rows
                if matched & set(pidx.toks[(r[key], node.field)])}
    if isinstance(node, ast.Phrase):
        terms = [pidx.norm(node.field, t) for t in node.phrases]
        if len(terms) == 1:
            return evaluate(pidx, ast.Term(node.field, terms[0]))
        out = {}
        idf_sum = sum(_idf(pidx.n, pidx.dfs.get((node.field, t), 0)) for t in terms
                      if (node.field, t) in pidx.dfs)
        if any((node.field, t) not in pidx.dfs for t in terms):
            return {}
        for r in rows:
            ts = pidx.toks[(r[key], node.field)]
            tf = _phrase_count(ts, terms, node.slop)
            if tf:
                lq = quantize_len(len(ts))
                out[r[key]] = (idf_sum * 2.2 * tf
                               / (tf + 1.2 * (0.25 + 0.75 * lq / pidx.avg[node.field])))
        return out
    if isinstance(node, ast.PhrasePrefix):
        terms = [pidx.norm(node.field, t) for t in node.phrases]
        prefix = terms[-1]
        exp = sorted(t for t in pidx.dictionary(node.field)
                     if t.startswith(prefix))[: node.max_expansions]
        if not exp:
            return {}
        if len(terms) == 1:
            return evaluate(pidx, ast.TermSet(node.field, exp))
        head = terms[:-1]
        if any((node.field, t) not in pidx.dfs for t in head):
            return {}
        idf_sum = sum(_idf(pidx.n, pidx.dfs[(node.field, t)]) for t in head)
        out = {}
        for r in rows:
            ts = pidx.toks[(r[key], node.field)]
            tf = sum(_phrase_count(ts, head + [e], 0) for e in exp)
            if tf:
                lq = quantize_len(len(ts))
                out[r[key]] = (idf_sum * 2.2 * tf
                               / (tf + 1.2 * (0.25 + 0.75 * lq / pidx.avg[node.field])))
        return out
    if isinstance(node, ast.TokenizedPhrase):
        cfg = pidx.schema.value_analyzer(node.field)
        toks = py_tokenize(node.phrase, cfg.tokenizer, cfg.tokenizer_opts,
                           cfg.lowercase)
        if not toks:
            return {}
        return evaluate(pidx, ast.Phrase(node.field, toks, slop=node.slop))
    if isinstance(node, ast.Proximity):
        # reference match rule (proximity/scorer.rs:126-127):
        # diff <= distance + 1; in order → r - l must be non-negative
        lt, rt = pidx.norm(node.field, node.left), pidx.norm(node.field, node.right)
        out = {}
        for r in rows:
            ts = pidx.toks[(r[key], node.field)]
            lp = [i for i, x in enumerate(ts) if x == lt]
            rp = [i for i, x in enumerate(ts) if x == rt]
            hit = any(
                (0 <= q - p <= node.distance + 1) if node.ordered
                else (abs(q - p) <= node.distance + 1)
                for p in lp for q in rp)
            if hit:
                out[r[key]] = 1.0
        return out
    if isinstance(node, ast.HeapFilter):
        # simple-predicate evaluator (col <op> int, bare bool col, NOT x)
        # — enough for the fuzzer's generated heap predicates
        base = evaluate(pidx, node.query)
        by_key = {r[pidx.key]: r for r in pidx.rows}

        def _ok(doc):
            p = node.predicate.strip()
            neg = p.upper().startswith("NOT ")
            if neg:
                p = p[4:].strip()
            m = re.match(r"^(\w+)\s*(>=|<=|=|<|>)\s*(\d+)$", p)
            if m:
                x = by_key[doc].get(m.group(1))
                v = int(m.group(3))
                res = x is not None and \
                    {"=": x == v, ">": x > v, "<": x < v,
                     ">=": x >= v, "<=": x <= v}[m.group(2)]
            else:
                res = bool(by_key[doc].get(p))
            return res != neg
        return {d: s for d, s in base.items() if _ok(d)}
    if isinstance(node, ast.Boolean):
        must = [evaluate(pidx, c) for c in node.must]
        should = [evaluate(pidx, c) for c in node.should]
        must_not = [evaluate(pidx, c) for c in node.must_not]
        if node.must:
            docs = set.intersection(*[set(m) for m in must])
        elif node.should:
            docs = set.union(*[set(s) for s in should]) if should else set()
        elif node.must_not:
            docs = {r[key] for r in rows}
        else:
            return {}
        for mn in must_not:
            docs -= set(mn)
        out = {}
        for d in docs:
            sc = sum(m[d] for m in must if d in m) + \
                 sum(s[d] for s in should if d in s)
            n_should = sum(1 for s in should if d in s)
            if node.minimum_should_match and n_should < node.minimum_should_match:
                continue
            out[d] = sc
        return out
    if isinstance(node, ast.Boost):
        return {d: s * node.factor for d, s in evaluate(pidx, node.query).items()}
    if isinstance(node, ast.ConstScore):
        return {d: node.score for d in evaluate(pidx, node.query)}
    if isinstance(node, ast.DisjunctionMax):
        parts = [evaluate(pidx, c) for c in node.disjuncts]
        docs = set().union(*[set(p) for p in parts]) if parts else set()
        out = {}
        for d in docs:
            ss = [p[d] for p in parts if d in p]
            out[d] = max(ss) + node.tie_breaker * (sum(ss) - max(ss))
        return out
    if isinstance(node, ast.ScoreFilter):
        return {d: s for d, s in evaluate(pidx, node.query).items()
                if (node.min_score is None or s >= node.min_score)
                and (node.max_score is None or s <= node.max_score)}
    raise NotImplementedError(type(node).__name__)


def _lev_ok(t, v, d, prefix):
    if prefix:
        t = t[: len(v)]
    return _osa(t, v) <= d


def _osa(a, b):
    """Optimal-string-alignment distance (transposition cost 1) — full
    matrix, independent of the engine's banded implementation."""
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                dp[i][j] = min(dp[i][j], dp[i - 2][j - 2] + 1)
    return dp[m][n]


def _phrase_count(tokens, terms, slop):
    """Independent twin of the engine's sloppy count: offset-adjusted
    window width <= slop, distinct raw positions; a matching window
    CONSUMES every slot's position (each raw position participates in at
    most one counted match — Lucene/Tantivy consumption discipline),
    otherwise the minimum slot advances."""
    pos = {t: [i for i, x in enumerate(tokens) if x == t] for t in set(terms)}
    if any(not pos[t] for t in terms):
        return 0
    if slop == 0:
        sets = [set(p - j for p in pos[t]) for j, t in enumerate(terms)]
        return len(set.intersection(*sets))
    adj = [[p - j for p in pos[t]] for j, t in enumerate(terms)]
    ptr = [0] * len(adj)
    matches = 0
    while True:
        cur = [adj[i][ptr[i]] for i in range(len(adj))]
        matched = (max(cur) - min(cur) <= slop
                   and len({c + i for i, c in enumerate(cur)}) == len(cur))
        if matched:
            matches += 1
            for i in range(len(adj)):
                ptr[i] += 1
                if ptr[i] >= len(adj[i]):
                    return matches
        else:
            i_min = cur.index(min(cur))
            ptr[i_min] += 1
            if ptr[i_min] >= len(adj[i_min]):
                return matches
