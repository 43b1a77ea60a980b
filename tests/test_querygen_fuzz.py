"""Random-query differential fuzzing — the analog of the reference's
querygen suite (/root/reference/tests/tests/qgen.rs: random WHERE trees
executed with the custom scan ON vs vanilla Postgres as oracle;
compare_outcome querygen/mod.rs:687-766).

Here: seeded random query ASTs over mock_items, Spark compiler vs the
brute-force python oracle. Deterministic seeds → reproducible failures.
"""

import random

import pytest

from sparksearch.fixtures import mock_items_pdf, mock_items_index_schema
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from tests.oracle import PyIndex, evaluate

VOCAB = ["keyboard", "shoes", "running", "metal", "plastic", "novel",
         "organic", "wooden", "camera", "book", "wall", "woolen", "sleek",
         "compact", "zzz_missing"]
CATS = ["Electronics", "Footwear", "Books", "Toys", "Apparel"]


def gen_query(rng: random.Random, depth: int = 0) -> ast.Query:
    leaf_kinds = ["term", "termset", "match", "phrase", "range", "fuzzy",
                  "regex", "exists", "tokphrase", "proximity",
                  "phraseprefix", "all"]
    node_kinds = (["bool", "boost", "const", "dismax", "heapfilter",
                   "scorefilter"] if depth < 3 else [])
    kind = rng.choice(leaf_kinds * 2 + node_kinds * 3)
    if kind == "term":
        roll = rng.random()
        if roll < 0.15:
            return ast.Term("category", rng.choice(CATS))
        if roll < 0.35:
            # json-path term (ADVICE: json-path fields inside booleans)
            if rng.random() < 0.5:
                return ast.Term("metadata.color",
                                rng.choice(["Silver", "White", "Black",
                                            "Blue", "zzz_nope"]))
            return ast.Term("metadata.location",
                            rng.choice(["United States", "Canada", "China"]))
        return ast.Term("description", rng.choice(VOCAB))
    if kind == "termset":
        return ast.TermSet("description",
                           rng.sample(VOCAB, rng.randint(1, 4)))
    if kind == "match":
        words = " ".join(rng.sample(VOCAB, rng.randint(1, 3)))
        return ast.Match("description", words,
                         conjunction_mode=rng.random() < 0.5)
    if kind == "phrase":
        pool = [["running", "shoes"], ["metal", "keyboard"],
                ["digital", "camera"], ["keyboard", "shoes"]]
        return ast.Phrase("description", rng.choice(pool),
                          slop=rng.choice([0, 0, 1, 2]))
    if kind == "range":
        lo = rng.choice([None, 1, 2, 3, 4])
        hi = rng.choice([None, 2, 3, 4, 5])
        if lo is None and hi is None:
            lo = 3
        return ast.Range("rating", lower=lo, upper=hi,
                         lower_inclusive=rng.random() < 0.5,
                         upper_inclusive=rng.random() < 0.5)
    if kind == "fuzzy":
        return ast.Fuzzy("description",
                         rng.choice(["keybord", "shos", "runing", "metel"]),
                         distance=rng.randint(1, 2))
    if kind == "regex":
        return ast.Regex("description",
                         rng.choice(["key.*", "sho.*", ".*ing", "w.*l"]))
    if kind == "exists":
        return ast.Exists("description")
    if kind == "tokphrase":
        pool = ["running shoes", "metal keyboard", "keyboard shoes",
                "shoes running"]
        return ast.TokenizedPhrase("description", rng.choice(pool),
                                   slop=rng.choice([0, 1, 2]))
    if kind == "proximity":
        return ast.Proximity("description", rng.choice(VOCAB),
                             rng.randint(0, 4), rng.choice(VOCAB),
                             ordered=rng.random() < 0.5)
    if kind == "phraseprefix":
        pool = [["running", "sho"], ["metal", "key"], ["sleek", "run"],
                ["digital", "cam"]]
        return ast.PhrasePrefix("description", rng.choice(pool))
    if kind == "all":
        return ast.All()
    if kind == "heapfilter":
        pred = rng.choice(["rating >= 3", "rating < 4", "in_stock",
                           "NOT in_stock", "rating = 5"])
        return ast.HeapFilter(gen_query(rng, depth + 1), pred)
    if kind == "scorefilter":
        return ast.ScoreFilter(gen_query(rng, depth + 1),
                               min_score=rng.choice([0.1, 0.5, 1.0]))
    if kind == "boost":
        return ast.Boost(gen_query(rng, depth + 1), rng.choice([0.5, 2.0, 3.0]))
    if kind == "const":
        return ast.ConstScore(gen_query(rng, depth + 1), rng.choice([1.0, 5.0]))
    if kind == "dismax":
        return ast.DisjunctionMax(
            [gen_query(rng, depth + 1) for _ in range(rng.randint(2, 3))],
            tie_breaker=rng.choice([0.0, 0.3]))
    # bool
    n_must = rng.randint(0, 2)
    n_should = rng.randint(0, 3)
    n_not = rng.randint(0, 1)
    if n_must + n_should == 0:
        n_should = 1
    msm = None
    if n_should >= 2 and rng.random() < 0.3:
        msm = rng.randint(1, n_should)
    return ast.Boolean(
        must=[gen_query(rng, depth + 1) for _ in range(n_must)],
        should=[gen_query(rng, depth + 1) for _ in range(n_should)],
        must_not=[gen_query(rng, depth + 1) for _ in range(n_not)],
        minimum_should_match=msm)


@pytest.fixture(scope="module")
def pidx():
    return PyIndex(mock_items_pdf().to_dict("records"), "id",
                   mock_items_index_schema())


@pytest.mark.parametrize("seed", range(60))
def test_random_query_differential(mock_index, pidx, seed):
    rng = random.Random(1000 + seed)
    q = gen_query(rng)
    got = {r["doc_id"]: r["score"]
           for r in compile_query(mock_index, q).collect()}
    want = evaluate(pidx, q)
    assert set(got) == set(want), f"seed {seed}: doc sets differ for {q}"
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-6), (seed, q, d)


# -- hypothesis property tests (reference proptest analog) -------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcde", max_size=8),
       st.text(alphabet="abcde", max_size=8))
def test_osa_distance_matches_bruteforce(a, b):
    """Engine's banded OSA (compiler._osa_distance) vs the oracle's full
    matrix — two independent implementations."""
    from sparksearch.query.compiler import _osa_distance
    from tests.oracle import _osa
    want = _osa(a, b)
    for cap in (0, 1, 2, 3):
        got = _osa_distance(a, b, cap)
        if want <= cap:
            assert got == want, (a, b, cap)
        else:
            assert got > cap, (a, b, cap)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from("abc"), min_size=2, max_size=14),
       st.integers(0, 3))
def test_sloppy_count_matches_oracle(tokens, slop):
    """Engine's _sloppy_count vs the oracle's _phrase_count on random
    token streams, for 2-term phrases over the same alphabet."""
    from sparksearch.query.compiler import _sloppy_count
    from tests.oracle import _phrase_count
    terms = ["a", "b"]
    pos = [[i for i, t in enumerate(tokens) if t == term] for term in terms]
    if not all(pos):
        return
    got = _sloppy_count(pos, slop)
    want = _phrase_count(tokens, terms, slop)
    assert got == want, (tokens, slop)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefg XYZ'", max_size=30))
def test_porter2_total_and_stable(s):
    """porter2 never raises and output stems to itself or another valid
    stem under repeated application without raising."""
    from sparksearch.stem import porter2
    out = porter2(s)
    assert isinstance(out, str)
    porter2(out)  # must not raise
