"""Search query AST.

Node-for-node re-creation of the reference's query IR:
- compound/index-level nodes: pg_search/src/query/mod.rs:65-145
  (SearchQueryInput: Boolean, Boost, ConstScore, DisjunctionMax,
  ScoreFilter, MoreLikeThis, WithIndex, HeapFilter ...)
- field-level nodes: pg_search/src/query/pdb_query.rs:149-327
  (pdb::Query: Term, TermSet, Match, Phrase, PhrasePrefix, FuzzyTerm,
  Regex, Range, Exists, Proximity ...)

Scoring semantics (Tantivy parity, verified against regress goldens):
Term/Match/Phrase score BM25; Range/TermSet/Exists/All are constant-score
1.0; Boolean sums matching clause scores.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class Query:
    """Base class; nodes are plain frozen-ish dataclasses."""

    # -- convenience combinators (mirror paradedb.boolean/boost builders)
    def __and__(self, other):
        return Boolean(must=[self, other])

    def __or__(self, other):
        return Boolean(should=[self, other])

    def __invert__(self):
        return Boolean(must=[All()], must_not=[self])

    def boost(self, factor: float):
        return Boost(self, factor)

    def const_score(self, score: float):
        return ConstScore(self, score)


# pdb.boost / pdb.const typmod bounds (api/operator/boost.rs:157-175,
# const_score.rs:164-167): the score-adjust value is stored round-tripped
# through a 16-bit float, clamped to avoid precision-loss confusion.
TYPMOD_BOUNDS = (-2048.0, 2048.0)


def _f16_typmod(value, what: str) -> float:
    """Parse + encode a pdb.boost/pdb.const typmod value exactly like the
    reference (boost.out / const_score.out): f32 parse ('invalid {what}
    value: X' on failure), NaN rejected, clamp to [-2048..2048] (Inf
    clamps), then quantize through half precision (3.14159 → 3.140625)."""
    import math
    import struct
    try:
        f = float(value)
    except (TypeError, ValueError):
        raise ValueError(f"invalid {what} value: {value}")
    if math.isnan(f):
        raise ValueError(
            "only 16 bit floats in the range [-2048..2048] are supported")
    f = min(max(f, TYPMOD_BOUNDS[0]), TYPMOD_BOUNDS[1])
    return struct.unpack("<e", struct.pack("<e", f))[0]


def boost_typmod(query: "Query", value) -> "Boost":
    """The ``query::pdb.boost(value)`` cast surface (boost.out)."""
    return Boost(query, _f16_typmod(value, "boost"))


def const_typmod(query: "Query", value) -> "ConstScore":
    """The ``query::pdb.const(value)`` cast surface (const_score.out)."""
    return ConstScore(query, _f16_typmod(value, "const"))


@dataclass
class All(Query):
    """Match every document, score 1.0 (query/mod.rs:68)."""


@dataclass
class Empty(Query):
    """Match nothing (pdb_query.rs:151)."""


@dataclass
class Term(Query):
    """Exact term match; needle is normalized but not tokenized
    (pdb_query.rs:321-323).  ``tokenizer`` is the reference's RHS
    tokenizer cast (``t === 'hello'::pdb.ngram(5, 6)``,
    tokenizer-rhs-typmod.out): the needle is tokenized with THAT
    tokenizer first — one resulting token keeps exact-term semantics,
    several become a TermSet (eqeqeq.rs term_set_str branch)."""
    field: str
    value: object
    tokenizer: str | None = None
    tokenizer_opts: dict | None = None


@dataclass
class TermSet(Query):
    """Match any of N terms, constant score (pdb_query.rs:324-326)."""
    field: str
    terms: list


@dataclass
class Match(Query):
    """Tokenize the needle, then OR (or AND) the tokens
    (pdb_query.rs:214-228).  ``distance`` > 0 makes each token fuzzy.
    ``tokenizer`` overrides the analyzer for THIS query's needle (the
    reference's explicit `'sho'::pdb.ngram(...)` cast, which overrides
    even a field-level search_tokenizer — search_tokenizer.out)."""
    field: str
    value: str
    conjunction_mode: bool = False
    distance: int = 0
    tokenizer: str | None = None
    tokenizer_opts: dict | None = None


@dataclass
class Phrase(Query):
    """Ordered tokens within slop (pdb_query.rs:241-261).
    ``phrases`` are pre-tokenized terms in order.

    ``implicit`` marks a phrase the QUERY PARSER created by analyzing a
    needle into several tokens (e.g. one word ngram-analyzed into
    grams).  Implicit phrases are exempt from the ngram
    positions-support gate — over grams they ARE the substring-match
    semantics (keys_snippet_score.out scores 'tooth' over ngram(4,4)) —
    while explicit constructors (###, pdb.phrase, phrase_prefix,
    regex_phrase, proximity) still error (require_positions.out)."""
    field: str
    phrases: list
    slop: int = 0
    implicit: bool = False


@dataclass
class TokenizedPhrase(Query):
    """Phrase whose needle is tokenized with the field's analyzer at
    query time (pdb_query.rs:258-261; the ``### 'running shoes'`` and
    ``::pdb.slop(n)`` surface compiles to this node — slop.out).
    ``tokenizer`` is the reference's RHS tokenizer cast
    (``t ### 'hello'::pdb.ngram(5, 6)``, tokenizer-rhs-typmod.out):
    the needle is tokenized with THAT tokenizer instead of the
    field's analyzer."""
    field: str
    phrase: str
    slop: int = 0
    tokenizer: str | None = None
    tokenizer_opts: dict | None = None


@dataclass
class RegexPhrase(Query):
    """Phrase whose slots are regexes, each expanded against the term
    dictionary (pdb_query.rs:316-320 RegexPhrase)."""
    field: str
    regexes: list
    slop: int = 0
    max_expansions: int = 50


@dataclass
class PhrasePrefix(Query):
    """Phrase whose last token is a prefix (pdb_query.rs:249-252)."""
    field: str
    phrases: list
    max_expansions: int = 50


@dataclass
class Fuzzy(Query):
    """Levenshtein ≤ distance term match (pdb_query.rs:208-213)."""
    field: str
    value: str
    distance: int = 2
    prefix: bool = False
    # Damerau/OSA semantics (adjacent transposition costs 1), matching
    # the reference default (pdb_query.rs:208-213 transposition_cost_one);
    # False = classic Levenshtein.
    transposition_cost_one: bool = True


@dataclass
class Regex(Query):
    """Regex term match over the term dictionary, constant score
    (pdb_query.rs:313-320)."""
    field: str
    pattern: str


@dataclass
class Range(Query):
    """Range over a fast field / doc attribute, constant score
    (pdb_query.rs:262-273). Bounds None = unbounded."""
    field: str
    lower: object = None
    upper: object = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True


@dataclass
class Exists(Query):
    """Field is non-null (pdb_query.rs:195)."""
    field: str


@dataclass
class RangeValue:
    """A PG-style range literal: bounds may be None (unbounded)."""
    lower: object = None
    upper: object = None
    lower_inclusive: bool = True
    upper_inclusive: bool = False  # PG int ranges normalize to [lo, hi)


@dataclass
class RangeTerm(Query):
    """Range column contains a point (pdb_query.rs:274-312 RangeTerm:
    ``weight_range @@@ '5'``)."""
    field: str
    value: object


@dataclass
class RangeContains(Query):
    """Range column contains the given range (range_contains)."""
    field: str
    value: RangeValue


@dataclass
class RangeIntersects(Query):
    """Range column intersects the given range (range_intersects)."""
    field: str
    value: RangeValue


@dataclass
class RangeWithin(Query):
    """Range column lies within the given range (range_within)."""
    field: str
    value: RangeValue


@dataclass
class LtreeDescendant(Query):
    """ltree descendant-or-self: ``path <@ 'Top.Science'`` — the one ltree
    operator the reference pushes into the index
    (customscan/pushdown.rs:36-49 is_ltree_descendant_operator).
    Matches paths equal to ``ancestor`` or starting with ``ancestor || '.'``."""
    field: str
    ancestor: str


@dataclass
class LtreeAncestor(Query):
    """ltree ancestor-or-self: ``path @> 'Top.Science.Astronomy'`` (PG ltree
    ``@>``; the reference evaluates it via heap fallback — we support it
    index-side for symmetry). Matches paths that are a dotted prefix of
    ``descendant``."""
    field: str
    descendant: str


@dataclass
class Boolean(Query):
    """Lucene boolean (query/mod.rs:69-86): score = Σ matching clause
    scores; must_not excludes; minimum_should_match filters on the number
    of matched should clauses."""
    must: list = dc_field(default_factory=list)
    should: list = dc_field(default_factory=list)
    must_not: list = dc_field(default_factory=list)
    minimum_should_match: int | None = None


@dataclass
class Boost(Query):
    """score × factor (query/mod.rs:87-90)."""
    query: Query
    factor: float


@dataclass
class ConstScore(Query):
    """Replace score with a constant (query/mod.rs:91-94)."""
    query: Query
    score: float


@dataclass
class DisjunctionMax(Query):
    """max(clause scores) + tie_breaker · (sum − max) (query/mod.rs:98-101)."""
    disjuncts: list = dc_field(default_factory=list)
    tie_breaker: float = 0.0


@dataclass
class ScoreFilter(Query):
    """Keep docs whose score lies within bounds (query/score.rs:24-39)."""
    query: Query
    min_score: float | None = None
    max_score: float | None = None


@dataclass
class MoreLikeThis(Query):
    """Terms of a source doc re-queried as a should-boolean
    (query/more_like_this.rs; builders api/builder_fns/mlt.rs:28-100).

    ``fields=None`` and ``field=None`` = field-less mode: every indexed
    non-json, non-vector column contributes terms (more_like_this.rs:
    216-218 skips ``categorized.is_json || is_vector``). Explicitly
    requesting a json or vector field raises, mirroring the reference
    errors (more_like_this.rs:207-214).

    When ``max_query_terms`` caps the candidate set, the kept terms are
    the ones with the LOWEST tf*idf (ties broken by term order). This is
    deliberate reference parity: expected/more_like_this.out's
    ``max_query_terms => 2`` over doc 1 ('aaa bbb ccc') still matches
    the 'aaa aaa' docs, so 'aaa' — the lowest-idf term — survived the
    cap; tantivy's eviction pops the max-scored entry from its
    BinaryHeap. A Lucene-style keep-highest would drop 'aaa' and
    contradict that expected file.
    """
    field: str | None = None
    document_id: object = None
    document_text: str | None = None
    min_term_frequency: int | None = None
    min_doc_frequency: int | None = None
    max_doc_frequency: int | None = None
    max_query_terms: int | None = None
    fields: list | None = None
    min_word_length: int | None = None
    max_word_length: int | None = None
    stopwords: list | None = None
    boost_factor: float | None = None


@dataclass
class ProxRegex:
    """Regex proximity operand, expanded against the term dictionary
    (query/proximity/mod.rs ProximityClause::Regex)."""
    pattern: str
    max_expansions: int = 50


@dataclass
class Proximity(Query):
    """left within N tokens of right (pdb_query.rs:253-257,
    query/proximity/mod.rs). ``ordered``: left must precede right.

    Operands are proximity CLAUSES (ProximityClause in the reference):
    a term string, a :class:`ProxRegex`, a list of alternatives
    (ProximityClause::Clauses — any member matches), or a nested
    :class:`Proximity` (its matched-pair positions on the side facing
    the outer operand participate in the outer distance check,
    weight.rs:120-140)."""
    field: str
    left: object
    distance: int
    right: object
    ordered: bool = False


@dataclass
class HeapFilter(Query):
    """Run the indexed query, then apply arbitrary non-indexed column
    predicates (query/mod.rs:121-126). ``predicate`` is a SQL boolean
    expression over the doc table's columns."""
    query: Query
    predicate: str


@dataclass
class HeapOr(Query):
    """Indexed query OR a non-indexed SQL predicate — the custom-scan OR
    pushdown (``name @@@ '...' OR category = '...'``): matches the UNION
    of both sides; docs matching only the predicate score 0
    (score_non_indexed_predicates.out: MacBook Pro / Sony Headphones
    carry score 0 in the OR result)."""
    query: Query
    predicate: str


@dataclass
class Parse(Query):
    """Tantivy query-string mini-language (pdb_query.rs:229-240); resolved
    by parser.parse_query at compile time."""
    query_string: str
    field: str | None = None
    lenient: bool = False
    conjunction_mode: bool = False
