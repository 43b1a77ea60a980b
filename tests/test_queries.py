"""Differential tests: Spark compiler vs brute-force python oracle over the
mock_items corpus (analog of the reference's querygen suite,
/root/reference/tests/tests/qgen.rs)."""

import pytest

from sparksearch.fixtures import mock_items_pdf, mock_items_index_schema
from sparksearch.query import ast, parse_query
from sparksearch.query.compiler import compile_query
from tests.oracle import PyIndex, evaluate


@pytest.fixture(scope="module")
def pidx():
    rows = mock_items_pdf().to_dict("records")
    return PyIndex(rows, "id", mock_items_index_schema())


QUERIES = [
    ast.Term("description", "shoes"),
    ast.Term("description", "SHOES"),   # raw needle misses lowercased index
                                        # (citext.out test 5 '=== QUICK')
    ast.Term("description", "nonexistent"),
    ast.TermSet("description", ["keyboard", "shoes", "novel"]),
    ast.Match("description", "running shoes"),
    ast.Match("description", "running shoes", conjunction_mode=True),
    ast.Match("description", "wireless earbuds keyboard"),
    ast.Phrase("description", ["running", "shoes"]),
    ast.Phrase("description", ["sleek", "shoes"]),          # not adjacent
    ast.Phrase("description", ["sleek", "shoes"], slop=1),  # one gap allowed
    ast.Phrase("description", ["plastic", "keyboard"]),
    ast.Boolean(should=[ast.Term("description", "keyboard"),
                        ast.Term("description", "shoes")]),
    ast.Boolean(must=[ast.Term("description", "shoes"),
                      ast.Term("description", "running")]),
    ast.Boolean(must=[ast.Term("description", "shoes")],
                must_not=[ast.Term("description", "running")]),
    ast.Boolean(should=[ast.Term("description", "keyboard"),
                        ast.Term("description", "metal"),
                        ast.Term("description", "plastic")],
                minimum_should_match=2),
    ast.Boolean(must=[ast.Range("rating", lower=4)],
                should=[ast.Term("description", "shoes")]),
    ast.Boost(ast.Term("description", "shoes"), 2.5),
    ast.ConstScore(ast.Term("description", "shoes"), 7.0),
    ast.DisjunctionMax([ast.Term("description", "keyboard"),
                        ast.Term("description", "metal")], tie_breaker=0.3),
    ast.Range("rating", lower=2, upper=4, upper_inclusive=False),
    ast.Range("category", lower="Electronics", upper="Footwear"),
    ast.Exists("description"),
    ast.Fuzzy("description", "keybord", distance=1),
    ast.Fuzzy("description", "sheos", distance=2),
    ast.Regex("description", "key.*"),
    ast.Regex("description", "sho(es|p)"),
    ast.ScoreFilter(ast.Term("description", "shoes"), min_score=3.5),
    ast.Boolean(must=[ast.All()], must_not=[ast.Term("description", "shoes")]),
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: repr(q)[:60])
def test_differential(mock_index, pidx, q):
    got = {r["doc_id"]: r["score"] for r in compile_query(mock_index, q).collect()}
    want = evaluate(pidx, q)
    assert set(got) == set(want), f"doc sets differ for {q}"
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-6), (q, d)


PARSE_CASES = [
    ("keyboard", ast.Term("description", "keyboard")),
    ("running shoes", None),
    ("+running +shoes", None),
    ("running AND shoes", None),
    ("keyboard OR shoes", None),
    ("shoes -running", None),
    ("shoes NOT running", None),
    ('"running shoes"', None),
    ('"sleek shoes"~1', None),
    ("keybord~1", None),
    ("shoes^2.5", None),
    ("category:Footwear", None),
    ("rating:[2 TO 4]", None),
    ("rating:{2 TO 4}", None),
    ("rating:>=4", None),
    ("rating:>4 shoes", None),
    ("(keyboard OR shoes) AND metal", None),
    ("key*", None),
    ("/sho(es|p)/", None),
    ("high-resolution", None),  # multi-token word → phrase
]


@pytest.mark.parametrize("qs,expect", PARSE_CASES, ids=[c[0] for c in PARSE_CASES])
def test_parse_differential(mock_index, pidx, qs, expect):
    node = parse_query(qs, "description", mock_items_index_schema())
    if expect is not None:
        assert node == expect
    got = {r["doc_id"]: r["score"] for r in compile_query(mock_index, node).collect()}
    want = evaluate(pidx, node)
    assert set(got) == set(want), f"doc sets differ for {qs!r}: {node}"
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-6), (qs, d)


def test_parse_specific_semantics(mock_index, pidx):
    # conjunction_mode flips the implicit operator
    n1 = parse_query("running shoes", "description", mock_items_index_schema(),
                     conjunction_mode=True)
    assert evaluate(pidx, n1).keys() == {3}
    n2 = parse_query("running shoes", "description", mock_items_index_schema())
    assert set(evaluate(pidx, n2)) == {3, 4, 5}


def test_phrase_prefix(mock_index):
    q = ast.PhrasePrefix("description", ["running", "sho"])
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    assert got == {3}
    q1 = ast.PhrasePrefix("description", ["key"])
    got1 = {r["doc_id"] for r in compile_query(mock_index, q1).collect()}
    assert got1 == {1, 2}


def test_proximity(mock_index):
    # "sleek" within 1 token of "shoes" (one word between) — doc 3
    q = ast.Proximity("description", "sleek", 1, "shoes", ordered=True)
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    assert got == {3}
    q0 = ast.Proximity("description", "sleek", 0, "shoes", ordered=True)
    assert {r["doc_id"] for r in compile_query(mock_index, q0).collect()} == set()
    qu = ast.Proximity("description", "shoes", 1, "sleek", ordered=False)
    assert {r["doc_id"] for r in compile_query(mock_index, qu).collect()} == {3}


def test_more_like_this(mock_index):
    q = ast.MoreLikeThis("description", document_id=3, min_doc_frequency=1,
                         max_query_terms=5)
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    assert 3 in got              # source doc included (more_like_this.out)
    assert {4, 5} <= got         # other shoes docs surface


def test_heap_filter(mock_index):
    q = ast.HeapFilter(ast.Term("description", "shoes"), "in_stock = true")
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    assert got == {3, 5}


def test_json_field_search(mock_index):
    # reference json_fields: metadata.color / metadata.location paths
    # (e.g. regress queries over the topk_scores index config)
    # raw needles verbatim — json_aggregate.out:243-261 pins that
    # paradedb.term('metadata.brand', 'Apple') MISSES the lowercased
    # index tokens (NULL avg over zero rows); only the token-cased
    # needle hits
    q_raw = ast.Term("metadata.color", "Silver")
    assert compile_query(mock_index, q_raw).count() == 0
    q = ast.Term("metadata.color", "silver")
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    assert got == {1, 9}
    q2 = ast.Term("metadata.location", "united states")
    got2 = {r["doc_id"] for r in compile_query(mock_index, q2).collect()}
    assert len(got2) == 14  # every 3rd row starting at id 1
    # parse syntax with json path
    from sparksearch.query import parse_query
    from sparksearch.fixtures import mock_items_index_schema
    n = parse_query('metadata.color:Silver', "description",
                    mock_items_index_schema())
    got3 = {r["doc_id"] for r in compile_query(mock_index, n).collect()}
    assert got3 == {1, 9}
    # boolean combination with a text field
    combo = ast.Boolean(must=[ast.Term("description", "keyboard"),
                              ast.Term("metadata.location", "canada")])
    got4 = {r["doc_id"] for r in compile_query(mock_index, combo).collect()}
    assert got4 == {2}


def test_json_field_tokens_spark_python_parity(spark):
    import pyspark.sql.functions as F
    from sparksearch.analysis import analyzer_expr, py_analyze
    from sparksearch.schema import FieldConfig
    cfg = FieldConfig(name="m", tokenizer="json",
                      tokenizer_opts={"value_tokenizer": "default"},
                      lowercase=True)
    texts = ['{"color":"Sky Blue","loc":"US"}', '{"a":"x y"}', None,
             "not json", "{}"]
    df = spark.createDataFrame([(t,) for t in texts], "m string")
    got = [[(e["t"], e["p"]) for e in r["s"]] for r in
           df.select(analyzer_expr(F.col("m"), cfg).alias("s")).collect()]
    for t, g in zip(texts, got):
        assert g == py_analyze(t, cfg), t


def test_aliased_multi_source_fields(spark):
    """Several index fields sourced from one column with different
    tokenizers (reference alias/column option, schema/mod.rs:527-561)."""
    from sparksearch.index import build_index
    from sparksearch.schema import IndexSchema, FieldConfig
    rows = [(1, "GetUserData fast"), (2, "get user data slow")]
    docs = spark.createDataFrame(rows, "id int, body string")
    schema = IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="body", tokenizer="default"),
        FieldConfig(name="body_code", source="body", tokenizer="source_code"),
    ])
    idx = build_index(docs, schema)
    d = {r["doc_id"] for r in
         compile_query(idx, ast.Term("body", "getuserdata")).collect()}
    assert d == {1}
    c = {r["doc_id"] for r in
         compile_query(idx, ast.Term("body_code", "user")).collect()}
    assert c == {1, 2}   # camelCase split only in the code-tokenized field


def test_boolean_batched_jsonpath_terms(mock_index):
    """Regression: JSON-path terms inside should/must must not be batched
    through the plain term-dictionary scan (they need the path prefix)."""
    q = ast.Boolean(should=[ast.Term("metadata.color", "silver"),
                            ast.Term("metadata.color", "white")])
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    silver = {r["doc_id"] for r in
              compile_query(mock_index, ast.Term("metadata.color", "silver")).collect()}
    white = {r["doc_id"] for r in
             compile_query(mock_index, ast.Term("metadata.color", "white")).collect()}
    assert silver and white and got == silver | white
    # mixed should: plain text term + json-path term keeps both clauses
    mixed = ast.Boolean(should=[ast.Term("description", "keyboard"),
                                ast.Term("metadata.color", "silver")])
    gm = {r["doc_id"] for r in compile_query(mock_index, mixed).collect()}
    kb = {r["doc_id"] for r in
          compile_query(mock_index, ast.Term("description", "keyboard")).collect()}
    assert gm == kb | silver
    # must over two json-path terms of the same field ref
    m = ast.Boolean(must=[ast.Term("metadata.color", "silver"),
                          ast.Term("metadata.location", "united states")])
    gmu = {r["doc_id"] for r in compile_query(mock_index, m).collect()}
    us = {r["doc_id"] for r in compile_query(
        mock_index, ast.Term("metadata.location", "united states")).collect()}
    assert gmu == silver & us and gmu


def test_boolean_batched_unindexed_attr_terms(mock_index):
    """Regression: unindexed string-attribute terms inside booleans route
    through the attr-filter fallback instead of raising KeyError."""
    q = ast.Boolean(should=[ast.Term("latest_available_time", "09:12:34"),
                            ast.Term("latest_available_time", "13:27:09")])
    got = {r["doc_id"] for r in compile_query(mock_index, q).collect()}
    assert got == {1, 2}
    q2 = ast.Boolean(must=[ast.Term("description", "keyboard"),
                           ast.Term("latest_available_time", "09:12:34")])
    assert compile_query(mock_index, q2).count() >= 0  # no KeyError


def test_search_offset_without_limit(mock_index):
    import warnings as _warnings
    from sparksearch.query.search import search
    allrows = search(mock_index, ast.Term("description", "shoes"),
                     columns=["id"]).collect()
    # offset-only paging stays valid but WARNS (unpartitioned window over
    # the full match set — keyset paging is the scale path)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        off = search(mock_index, ast.Term("description", "shoes"),
                     offset=1, columns=["id"]).collect()
    assert any("keyset" in str(w.message) for w in caught)
    assert len(off) == len(allrows) - 1
    assert [r["id"] for r in off] == [r["id"] for r in allrows][1:]
    # with a limit the window input is pre-shrunk — no warning
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        search(mock_index, ast.Term("description", "shoes"),
               limit=2, offset=1, columns=["id"]).collect()
    assert not any("keyset" in str(w.message) for w in caught)


def test_phrase_requires_positions(spark):
    """Phrase/proximity on a record!='position' field raises a clear error
    (the reference errors instead of returning empty)."""
    import pytest as _pytest
    from sparksearch.index import build_index
    from sparksearch.schema import IndexSchema, FieldConfig, RECORD_FREQ
    docs = spark.createDataFrame([(1, "alpha beta gamma")], "id int, body string")
    idx = build_index(docs, IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="body", tokenizer="default", record=RECORD_FREQ)]))
    with _pytest.raises(ValueError, match="position"):
        compile_query(idx, ast.Phrase("body", ["alpha", "beta"]))
    with _pytest.raises(ValueError, match="position"):
        compile_query(idx, ast.Proximity("body", "alpha", "gamma", 2))


def test_expression_source_field_and_sort(spark):
    """Indexed expression source + ORDER BY an expression
    (aliased_text_expression_topk_orderby.out): lower(description) as a
    literal field; match disjunction then sort by the expression."""
    from sparksearch.fixtures import mock_items
    from sparksearch.index import build_index
    from sparksearch.query.search import search
    from sparksearch.schema import IndexSchema, FieldConfig
    docs = mock_items(spark)
    # the golden aliases `description` to the lowered-literal expression:
    # a match against it is a whole-string literal term, so the
    # disjunction 'sleek running shoes' hits exactly one row
    idx = build_index(docs, IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="description", source="lower(description)",
                    tokenizer="literal", lowercase=False)]))
    rows = search(idx, ast.Term("description", "sleek running shoes"),
                  limit=5, order_by=[("lower(description)", "asc")],
                  columns=["description", "rating"]).collect()
    assert [(r["description"], r["rating"]) for r in rows] == \
        [("Sleek running shoes", 5)]
