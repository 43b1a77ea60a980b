"""Query layer: AST (pg_search SearchQueryInput / pdb::Query parity),
query-string parser, and the AST → DataFrame compiler."""

from sparksearch.query.ast import (  # noqa: F401
    All, Empty, Term, TermSet, Match, Phrase, PhrasePrefix, Fuzzy, Regex,
    Range, Exists, Boolean, Boost, ConstScore, DisjunctionMax, ScoreFilter,
    MoreLikeThis, Proximity, HeapFilter, Parse,
)
from sparksearch.query.parser import parse_query  # noqa: F401
from sparksearch.query.json_input import from_json  # noqa: F401
from sparksearch.query.compiler import compile_query  # noqa: F401
from sparksearch.query.search import search  # noqa: F401
