import pyspark.sql.functions as F
import pytest

from sparksearch.analysis import analyzer_expr, py_analyze, py_tokenize
from sparksearch.schema import FieldConfig

SAMPLES = [
    "Ergonomic metal keyboard",
    "High-resolution DSLR",
    "Bluetooth-enabled speaker",
    "  mixed   WHITESPACE\ttokens ",
    "don't stop-believing 3,000.5 items",
    "Café déjà-vu naïve",
    "",
    None,
]


def _spark_tokens(spark, cfg, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(analyzer_expr(F.col("text"), cfg).alias("s")).collect()
    return [[(e["t"], e["p"]) for e in r["s"]] for r in rows]


@pytest.mark.parametrize("tokenizer", ["default", "whitespace", "unicode_words",
                                       "keyword", "literal_normalized"])
def test_spark_matches_python(spark, tokenizer):
    cfg = FieldConfig(name="text", tokenizer=tokenizer)
    got = _spark_tokens(spark, cfg, SAMPLES)
    for text, g in zip(SAMPLES, got):
        assert g == py_analyze(text, cfg), (tokenizer, text)


def test_pandas_tokenizers_match_python(spark):
    for tok, opts in [("ngram", {"min_gram": 2, "max_gram": 3}),
                      ("edge_ngram", {"min_gram": 1, "max_gram": 4}),
                      ("source_code", {}), ("chinese_compatible", {})]:
        cfg = FieldConfig(name="text", tokenizer=tok, tokenizer_opts=opts)
        texts = ["HelloWorld foo_bar2", "abc", "中文测试 mixed", ""]
        got = _spark_tokens(spark, cfg, texts)
        for text, g in zip(texts, got):
            assert g == py_analyze(text, cfg), (tok, text)


def test_json_tokenizer_spark_matches_python(spark):
    """JVM _jvm_token_array ≡ py_tokenize on the json tokenizer, including
    the class ADVICE.md flagged: JSON *string* values whose text parses as
    an object/array must stay scalar strings (py isinstance walk), not be
    expanded as nested structure — the variant-typed gate decides."""
    texts = [
        '{"a": "hello world", "n": 3}',
        # string values that LOOK structural — must remain scalars
        '{"note": "{\\"a\\":1}", "arrstr": "[1,2]"}',
        # genuinely nested twins of the same shapes
        '{"note": {"a": 1}, "arrstr": [1, 2]}',
        # arrays mixing structural and scalar elements, incl. a
        # JSON-looking string element
        '{"xs": [{"k": "v"}, "plain", "{\\"k\\":9}", [3, 4]]}',
        # beyond-depth object serialized as scalar (max_depth default 4)
        '{"d1": {"d2": {"d3": {"d4": {"deep": "x"}}}}}',
        # null / bool / float scalars, empty object and array
        '{"z": null, "b": true, "f": 1.5, "eo": {}, "ea": []}',
        '{"mixed": ["{\\"a\\":1}", {"a": 1}]}',
        # RFC3339-ish values become ONE canonical date token; invalid
        # dates and near-misses word-split as ordinary text
        '{"tstz": "2023-05-01T09:12:34Z", "sp": "2023-05-01 09:12:34+02:00",'
        ' "d": "2024-05-15", "bad": "2023-13-99", "txt": "born 2023-05-01"}',
        '{"arr": ["2023-05-01T09:12:34Z", "plain"]}',
        "not json at all",
        "",
        None,
    ]
    cfg = FieldConfig(name="j", tokenizer="json")
    got = _spark_tokens(spark, cfg, texts)
    for text, g in zip(texts, got):
        assert g == py_analyze(text, cfg), text
    # the ambiguous pair must tokenize DIFFERENTLY (string value stays
    # scalar: note:a note:1; nested object expands the path: note.a:1)
    flat = [t for t, _ in got[1]]
    nested = [t for t, _ in got[2]]
    assert "note:a" in flat and "note.a:1" not in flat
    assert "note.a:1" in nested


def test_default_tokenizer_goldens():
    # parity with the reference's default config (lowercase + non-alnum split)
    assert py_tokenize("Ergonomic metal keyboard") == ["ergonomic", "metal", "keyboard"]
    assert py_tokenize("High-resolution DSLR") == ["high", "resolution", "dslr"]
    assert py_tokenize("Plastic Keyboard") == ["plastic", "keyboard"]


def test_mock_items_corpus_stats():
    # the corpus totals that drive the golden BM25 scores
    from sparksearch.fixtures import mock_items_pdf
    pdf = mock_items_pdf()
    toks = [py_tokenize(d) for d in pdf["description"]]
    assert len(toks) == 41
    assert sum(len(t) for t in toks) == 123  # avg_len == 3.0
    dfs = {}
    for ts in toks:
        for t in set(ts):
            dfs[t] = dfs.get(t, 0) + 1
    assert dfs["keyboard"] == 2 and dfs["shoes"] == 3


def test_filters():
    cfg = FieldConfig(name="t", tokenizer="default",
                      filters=[("remove_short", 3), ("stopwords", {"the"})])
    out = py_analyze("the big ox ran THE race", cfg)
    assert out == [("big", 1), ("ran", 3), ("race", 5)]


def test_filters_spark_parity(spark):
    cfg = FieldConfig(name="t", tokenizer="default",
                      filters=[("remove_short", 3), ("stopwords", ("the",)),
                               ("remove_long", 8)])
    texts = ["the big ox ran THE race", "extraordinarily long tokens here"]
    got = _spark_tokens(spark, cfg, texts)
    for text, g in zip(texts, got):
        assert g == py_analyze(text, cfg)


def test_stopwords_positions_golden():
    # reference expected/stopwords.out: 'something, stopword, else' with
    # stopwords=['stopword'] → something@0, else@2 (position gap preserved)
    cfg = FieldConfig(name="t", tokenizer="default",
                      filters=[("stopwords", {"stopword"})])
    assert py_analyze("something, stopword, else", cfg) == \
        [("something", 0), ("else", 2)]


def test_porter2_stemmer_goldens():
    """Reference golden (tokenizer-typmod.out): 'Running Shoes.  olé' with
    lowercase=false + stemmer=english + ascii_folding=true → {Run,Shoe,ole};
    with the default chain (lowercase first) → {run,shoe,ole}."""
    cfg = FieldConfig(name="t", tokenizer="simple", lowercase=False,
                      filters=[("stemmer", "english"),
                               ("ascii_folding", None)])
    assert [t for t, _ in py_analyze("Running Shoes.  olé", cfg)] == \
        ["Run", "Shoe", "ole"]
    cfg2 = FieldConfig(name="t", tokenizer="simple",
                       filters=[("stemmer", "english"),
                                ("ascii_folding", None)])
    assert [t for t, _ in py_analyze("Running Shoes.  olé", cfg2)] == \
        ["run", "shoe", "ole"]


def test_stopwords_language_goldens():
    """Reference golden (multi_language_stopwords.out): English and
    English+French built-in stopword lists."""
    cfg = FieldConfig(name="t", tokenizer="simple",
                      filters=[("stopwords_language", "English")])
    assert [t for t, _ in py_analyze("the quick fox and", cfg)] == \
        ["quick", "fox"]
    cfg2 = FieldConfig(name="t", tokenizer="simple",
                       filters=[("stopwords_language", "English,French")])
    assert [t for t, _ in py_analyze("the quick fox and le renard et", cfg2)] \
        == ["quick", "fox", "renard"]
    cfg3 = FieldConfig(name="t", tokenizer="simple",
                       filters=[("stopwords_language", "French,English")])
    assert [t for t, _ in py_analyze("The cat in the hat le renard et", cfg3)] \
        == ["cat", "hat", "renard"]


def test_stemmer_stopwords_spark_parity(spark):
    cfg = FieldConfig(name="t", tokenizer="default",
                      filters=[("stemmer", "english"),
                               ("stopwords_language", "english")])
    texts = ["the running dogs were consistently conspiring",
             "Generalizations about ponies and knives", None, ""]
    got = _spark_tokens(spark, cfg, texts)
    for text, g in zip(texts, got):
        assert g == py_analyze(text, cfg), text


def test_stemmed_field_search_end_to_end(spark):
    """An index declaring stemmer(English) matches morphological variants
    (the most common non-default tokenizer config)."""
    from sparksearch.index import build_index
    from sparksearch.query.compiler import compile_query
    from sparksearch.query import ast
    from sparksearch.schema import IndexSchema
    rows = [(1, "the dogs were running fast"),
            (2, "a dog runs"), (3, "cats sleep")]
    docs = spark.createDataFrame(rows, "id int, body string")
    schema = IndexSchema(key_field="id", text_fields=[
        FieldConfig(name="body", tokenizer="default",
                    filters=[("stemmer", "english"),
                             ("stopwords_language", "english")])])
    idx = build_index(docs, schema)
    # query values are analyzed with the same chain: "running" → "run"
    from sparksearch.analysis import py_analyze as _pa
    q_term = _pa("running", schema.field("body"))[0][0]
    got = {r["doc_id"] for r in
           compile_query(idx, ast.Term("body", q_term)).collect()}
    assert got == {1, 2}  # "running" and "runs" both stem to "run"
    dog = {r["doc_id"] for r in
           compile_query(idx, ast.Term("body", _pa("dogs", schema.field("body"))[0][0])).collect()}
    assert dog == {1, 2}
