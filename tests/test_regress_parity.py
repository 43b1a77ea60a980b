"""Ports of additional reference pg_regress cases (beyond topk_scores).

- minimum_should_match.out — msm row-set semantics on its 6-doc corpus
- score_filter.out — BM25 score golden on its 3-doc corpus
  (independent corpus → independently validates N/df/avgdl handling)
"""

import pytest

from sparksearch.index import build_index
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query
from sparksearch.schema import FieldConfig, IndexSchema


@pytest.fixture(scope="module")
def msm_index(spark):
    # /root/reference/pg_search/tests/pg_regress/expected/minimum_should_match.out:4-18
    rows = [
        (1, "apple banana cherry", "fruit salad"),
        (2, "apple banana", "two fruits"),
        (3, "apple only", "just apple"),
        (4, "banana cherry date", "three fruits"),
        (5, "cherry date elderberry", "more fruits"),
        (6, "unrelated document", "no match"),
    ]
    docs = spark.createDataFrame(rows, "id int, title string, body string")
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="title"),
                                      FieldConfig(name="body")])
    return build_index(docs, schema)


def _ids(index, q):
    return sorted(r["doc_id"] for r in compile_query(index, q).collect())


def test_msm_2_of_3(msm_index):
    # expected/minimum_should_match.out Test 1 → ids 1, 2, 4
    q = ast.Boolean(should=[ast.Term("title", "apple"),
                            ast.Term("title", "banana"),
                            ast.Term("title", "cherry")],
                    minimum_should_match=2)
    assert _ids(msm_index, q) == [1, 2, 4]


def test_msm_3_of_3(msm_index):
    # Test 2 → only id 1
    q = ast.Boolean(should=[ast.Term("title", "apple"),
                            ast.Term("title", "banana"),
                            ast.Term("title", "cherry")],
                    minimum_should_match=3)
    assert _ids(msm_index, q) == [1]


def test_msm_1_of_3_all_matching(msm_index):
    q = ast.Boolean(should=[ast.Term("title", "apple"),
                            ast.Term("title", "banana"),
                            ast.Term("title", "cherry")],
                    minimum_should_match=1)
    assert _ids(msm_index, q) == [1, 2, 3, 4, 5]


def test_msm_with_must(msm_index):
    # must apple + at least 1 of banana/cherry → 1, 2
    q = ast.Boolean(must=[ast.Term("title", "apple")],
                    should=[ast.Term("title", "banana"),
                            ast.Term("title", "cherry")],
                    minimum_should_match=1)
    assert _ids(msm_index, q) == [1, 2]


@pytest.fixture(scope="module")
def score_items_index(spark):
    # /root/reference/pg_search/tests/pg_regress/expected/score_filter.out:10-18
    rows = [
        (1, "PostgreSQL is amazing"),
        (2, "Search engines are powerful"),
        (3, "Tantivy is fast"),
    ]
    docs = spark.createDataFrame(rows, "id int, description string")
    schema = IndexSchema(key_field="id",
                         text_fields=[FieldConfig(name="description")])
    return build_index(docs, schema)


def test_score_filter_golden(score_items_index):
    # expected/score_filter.out TEST 1: score(postgresql on doc1) = 1.0226655
    q = ast.Parse("PostgreSQL", field="description")
    rows = compile_query(score_items_index, q).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["score"] == pytest.approx(1.0226655, abs=2e-6)

    sf = ast.ScoreFilter(q, min_score=0.0)
    assert [r["doc_id"] for r in compile_query(score_items_index, sf).collect()] == [1]
    sf_hi = ast.ScoreFilter(q, min_score=2.0)
    assert compile_query(score_items_index, sf_hi).count() == 0


@pytest.fixture(scope="module")
def bm25_params_docs(spark):
    # /root/reference/pg_search/tests/pg_regress/expected/bm25-params.out:6-15
    rows = [
        (1, "search search search"),
        (2, "search engine"),
        (3, "database query"),
        (4, "search"),
    ]
    return spark.createDataFrame(rows, "id int, short_text string")


def _scores(spark_docs, k1, b):
    schema = IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="short_text", k1=k1, b=b)])
    idx = build_index(spark_docs, schema)
    rows = compile_query(idx, ast.Term("short_text", "search")).collect()
    return {r["doc_id"]: round(r["score"], 4) for r in rows}


def test_bm25_default_params_golden(bm25_params_docs):
    # bm25-params.out TEST 1 (k1=1.2, b=0.75)
    assert _scores(bm25_params_docs, 1.2, 0.75) == \
        {1: 0.5062, 4: 0.4484, 2: 0.3567}


def test_bm25_k1_zero_golden(bm25_params_docs):
    # TEST 2: k1=0 → pure IDF, all matches tie
    assert _scores(bm25_params_docs, 0.0, 0.75) == \
        {1: 0.3567, 2: 0.3567, 4: 0.3567}


def test_slop_reorder_golden(mock_index):
    """Reference slop.out: on mock_items, phrase ARRAY['shoes','running']
    matches 'Sleek running shoes' (id 3) at slop=2 but not at slop 0/1;
    'running shoes'::pdb.slop(2) (TokenizedPhrase) matches id 3."""
    for slop, want in ((2, {3}), (1, set()), (0, set())):
        got = {r["doc_id"] for r in compile_query(
            mock_index, ast.Phrase("description", ["shoes", "running"],
                                   slop=slop)).collect()}
        assert got == want, f"slop={slop}"
    tp = {r["doc_id"] for r in compile_query(
        mock_index, ast.TokenizedPhrase("description", "running shoes",
                                        slop=2)).collect()}
    assert tp == {3}
    # ordered phrase still matches at every slop
    assert {r["doc_id"] for r in compile_query(
        mock_index, ast.Phrase("description", ["running", "shoes"],
                               slop=0)).collect()} == {3}


def test_sloppy_count_consumes_positions():
    """Overlapping sloppy windows must not double-use a position: the
    counter consumes every slot's position on a match (Lucene
    SloppyPhraseMatcher / Tantivy greedy pairwise-intersection
    discipline), so 'a b a b' ~2 for phrase "a b" counts the two
    disjoint matches (a0,b1),(a2,b3) — not the 3 windows a sliding scan
    sees ((a0,b1),(a2,b1),(a2,b3))."""
    from sparksearch.query.compiler import _sloppy_count
    # doc 'a b a b': a at raw [0,2], b at raw [1,3]
    assert _sloppy_count([[0, 2], [1, 3]], 2) == 2
    # exact phrase twice, non-overlapping: 'a b x a b'
    assert _sloppy_count([[0, 3], [1, 4]], 0) == 2
    # single occurrence each
    assert _sloppy_count([[0], [1]], 0) == 1
    # reorder at slop 2 (doc 'b a', phrase "a b"): a raw [1], b raw [0]
    assert _sloppy_count([[1], [0]], 2) == 1
    # same raw position may not serve two slots ('a a'~1 on doc 'a')
    assert _sloppy_count([[0], [0]], 1) == 0
    # 3-term phrase "a b c" on doc 'a b c a b c' ~1: two disjoint matches
    assert _sloppy_count([[0, 3], [1, 4], [2, 5]], 1) == 2
    # phrase "a a" ~2 on doc 'a b a': both slots see raw [0, 2]; one
    # match consuming (0, 2) — the leftover single 'a' cannot match alone
    assert _sloppy_count([[0, 2], [0, 2]], 2) == 1


def test_regex_phrase(mock_index):
    """RegexPhrase: 'runn.*' followed by 'sho.*' → id 3 only."""
    got = {r["doc_id"] for r in compile_query(
        mock_index, ast.RegexPhrase("description", ["runn.*", "sho.*"]))
        .collect()}
    assert got == {3}
    # slot with no dictionary match → empty
    assert compile_query(
        mock_index, ast.RegexPhrase("description", ["zzz.*", "sho.*"])
    ).count() == 0


def test_fuzzy_damerau_transposition(spark):
    """Reference transposition_cost_one (pdb_query.rs:208-213):
    'teh'~1 matches 'the'; with classic Levenshtein it doesn't."""
    from sparksearch.index import build_index
    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "a ten step plan")], "id int, body string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="body")]))
    damerau = {r["doc_id"] for r in compile_query(
        idx, ast.Fuzzy("body", "teh", distance=1)).collect()}
    assert damerau == {1, 2}  # the (transposition), ten (substitution)
    classic = {r["doc_id"] for r in compile_query(
        idx, ast.Fuzzy("body", "teh", distance=1,
                       transposition_cost_one=False)).collect()}
    assert classic == {2}  # 'the' costs 2 under classic Levenshtein


@pytest.fixture(scope="module")
def prox_index(spark):
    """The reference proximity regress corpus
    (tests/pg_regress/sql/proximity.sql)."""
    rows = [
        (1, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (2, "bbq chicken is delicious"),
        (3, "bbq ribs are delicious"),
        (4, "chicken will be served at the bbq party"),
        (5, "ribs will be served at the party bbq"),
    ]
    docs = spark.createDataFrame(rows, "id int, text string")
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="text")]))


def _prox_ids(idx, q):
    return {r["doc_id"] for r in compile_query(idx, q).collect()}


def test_proximity_regress_goldens(prox_index):
    """Every row set from expected/proximity.out."""
    P, R = ast.Proximity, ast.ProxRegex
    assert _prox_ids(prox_index, P("text", "a", 23, "z")) == set()
    assert _prox_ids(prox_index, P("text", "a", 24, "z")) == {1}
    # in-order: 'delicious' must precede bbq/chicken → no match
    assert _prox_ids(prox_index, P("text", "delicious", 2,
                                   ["bbq", "chicken"], ordered=True)) == set()
    assert _prox_ids(prox_index, P("text", "delicious", 2,
                                   ["bbq", "chicken"])) == {2, 3}
    assert _prox_ids(prox_index, P("text", ["bbq", "chicken"], 2,
                                   "delicious", ordered=True)) == {2, 3}
    # nested clause trees (prox_clause)
    nested_l = P("text", ["chicken", "ribs"], 0, "will")
    nested_r = P("text", "bbq", 0, "party")
    assert _prox_ids(prox_index, P("text", nested_l, 4, nested_r)) == {4, 5}
    assert _prox_ids(prox_index, P("text", nested_l, 4, nested_r,
                                   ordered=True)) == {4, 5}
    # regex operands
    assert _prox_ids(prox_index, P("text", R("del...ous"), 1,
                                   ["chicken", R("r..s")])) == {2, 3}
    assert _prox_ids(prox_index, P("text", R("del...ous"), 1,
                                   ["chicken", R("r..s")],
                                   ordered=True)) == set()
    # ## operator chains from the .sql file: a ##3 c ##2 g / a ##3 c ##3 g
    chain_no = P("text", P("text", "a", 3, "c"), 2, "g")
    chain_yes = P("text", P("text", "a", 3, "c"), 3, "g")
    assert _prox_ids(prox_index, chain_no) == set()
    assert _prox_ids(prox_index, chain_yes) == {1}
    # ##> in-order vs ## any-order with reversed terms
    assert _prox_ids(prox_index, P("text", "z", 24, "a")) == {1}
    assert _prox_ids(prox_index, P("text", "z", 24, "a",
                                   ordered=True)) == set()


def test_phrase_tokenization_golden(spark):
    """expected/phrase_tokenization.out: phrase terms normalize through
    the field analyzer at query time ('BANANA' matches 'banana'), slop=2
    allows one intervening token."""
    from sparksearch.index import build_index
    from sparksearch.query import ast, search
    from sparksearch.schema import IndexSchema, FieldConfig
    docs = spark.createDataFrame([
        (1, 'apple, with, banana'), (2, 'Banana with Cherry'),
        (3, 'Cherry, strawberry'), (4, 'apple, cherry, banana')],
        "id int, flavour string")
    idx = build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="flavour")]))
    got = [r["flavour"] for r in
           search(idx, ast.Phrase("flavour", ["apple", "BANANA"], slop=2),
                  columns=["flavour"], order_by=[("id", "asc")]).collect()]
    assert got == ['apple, with, banana', 'apple, cherry, banana']
