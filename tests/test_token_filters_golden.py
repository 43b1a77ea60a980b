"""Token-filter goldens (PUBLIC reference behavior):

- token_length_filter.out — remove_short/remove_long bounds are
  inclusive keeps (len >= short, len <= long); no implicit length cap.
- alpha_num_only_filter.out — alpha_num_only keeps ASCII alphanumerics
  ONLY (Czech words vanish) and composes AFTER ascii_folding in the
  builder's fixed chain order, so folded words survive; ngram grams
  containing spaces/punctuation are dropped.
- ascii_folding_filter.out — ascii_folding strips diacritics on both
  the index and query sides; the tokenize() API exposes the filter.
- token_trim_filter.out — trim strips Unicode whitespace (NBSP,
  ideographic space), dropping tokens that become empty.  (The golden
  uses jieba, a declared non-goal; the trim filter semantics are pinned
  with the keyword tokenizer instead.)

Ref: pg_search/tests/pg_regress/expected/{token_length_filter,
alpha_num_only_filter,ascii_folding_filter,token_trim_filter}.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.api import tokenize
from sparksearch.analysis import py_analyze, py_tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _toks(text, tokenizer="simple", filters=None, lowercase=True, **opts):
    cfg = FieldConfig(name="t", tokenizer=tokenizer, tokenizer_opts=opts,
                      filters=filters, lowercase=lowercase)
    return [t for t, _ in py_analyze(text, cfg)]


# ============================================================
# token_length_filter.out
# ============================================================

VERY_LONG = "f2a8d9c4e3b17891a02c4dfe7b9a331e9d50a671fc52b81d" * 40  # 1920ch
SENT = "a sentence with a veryveryverylong token"


def test_no_implicit_length_cap():
    # default pdb.simple keeps a multi-thousand-char token
    assert _toks(VERY_LONG) == [VERY_LONG.lower()]


def test_remove_long_drops_oversized():
    assert _toks(VERY_LONG, filters=[("remove_long", 255)]) == []


def test_remove_short_bounds():
    assert _toks(SENT) == ["a", "sentence", "with", "a",
                           "veryveryverylong", "token"]
    assert _toks(SENT, filters=[("remove_short", 1)]) == \
        ["a", "sentence", "with", "a", "veryveryverylong", "token"]
    assert _toks(SENT, filters=[("remove_short", 2)]) == \
        ["sentence", "with", "veryveryverylong", "token"]
    # remove_long=15: the 16-char token is dropped; =16 keeps it
    assert _toks(SENT, filters=[("remove_short", 2),
                                ("remove_long", 15)]) == \
        ["sentence", "with", "token"]
    assert _toks(SENT, filters=[("remove_short", 2),
                                ("remove_long", 16)]) == \
        ["sentence", "with", "veryveryverylong", "token"]


# ============================================================
# alpha_num_only_filter.out
# ============================================================

def test_alpha_num_only_ascii_passthrough():
    assert _toks("Hello World 123!") == ["hello", "world", "123"]
    assert _toks("Hello World 123!",
                 filters=[("alpha_num_only", None)]) == \
        ["hello", "world", "123"]


def test_alpha_num_only_ngram():
    got = _toks("Hello World 123!", tokenizer="ngram",
                filters=[("alpha_num_only", None)],
                min_gram=3, max_gram=3)
    assert got == ["hel", "ell", "llo", "wor", "orl", "rld", "123"]


def test_alpha_num_only_drops_non_ascii_letters():
    # 'Český člověk žlutý kůň příliš' -> {} (non-ASCII letters fail)
    assert _toks("Český člověk žlutý kůň příliš",
                 filters=[("alpha_num_only", None)]) == []


def test_ascii_folding_before_alpha_num_only():
    # the builder's fixed chain order: folding first, so folded Czech
    # words survive the ASCII gate
    assert _toks("Český člověk žlutý kůň příliš",
                 filters=[("ascii_folding", None),
                          ("alpha_num_only", None)]) == \
        ["cesky", "clovek", "zluty", "kun", "prilis"]


def test_tokenize_api_fixed_filter_order():
    # kwarg order never matters: alpha_num_only before ascii_folding in
    # the call still folds first (manager.rs fixed chain)
    got = _toks("Český člověk", filters=[("ascii_folding", None),
                                         ("alpha_num_only", None)])
    assert got == ["cesky", "clovek"]


# ============================================================
# ascii_folding_filter.out — index + query side
# ============================================================

ASCII_DOCS = [
    (1, "Café résumé mañana canción"),
    (2, "Niño jalapeño piñata corazón"),
    (3, "Übermäßig schön Straße groß"),
    (4, "Français façade naïve élève"),
    (5, "Český člověk žlutý kůň příliš"),
    (6, "Ångström smörgåsbord blåbär gröt"),
    (7, "Málaga fútbol avión océano"),
    (8, "Garçon hôtel théâtre rôle dîner"),
    (9, "São Paulo açúcar português"),
    (10, "Beyoncé déjà vu touché fiancé"),
]


@pytest.fixture(scope="module")
def ascii_idx(spark):
    docs = spark.createDataFrame(ASCII_DOCS, "id long, description string")
    idx = build_index(docs, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="description",
                                 filters=[("ascii_folding", None)])]))
    return idx


@pytest.mark.parametrize("needle,want", [
    ("café", [1]), ("cafe", [1]), ("Ångström", [6]), ("angstrom", [6])])
def test_folded_index_matches_both_forms(ascii_idx, needle, want):
    from sparksearch.query.parser import parse_query
    node = parse_query(needle, "description", ascii_idx.schema)
    got = sorted(r["doc_id"] for r in
                 compile_query(ascii_idx, node).collect())
    assert got == want


def test_tokenize_api_ascii_folding(spark):
    rows = tokenize(spark, "default", "café", ascii_folding=True).collect()
    assert [(r["token"], r["position"]) for r in rows] == [("cafe", 0)]
    rows = tokenize(spark, "default", "café", ascii_folding=False).collect()
    assert [(r["token"], r["position"]) for r in rows] == [("café", 0)]
    rows = tokenize(spark, "default", "café").collect()
    assert [(r["token"], r["position"]) for r in rows] == [("café", 0)]


def test_fold_sharp_s():
    # Lucene/Tantivy ASCIIFolding maps ß -> ss (NFKD alone cannot)
    assert _toks("Straße groß", filters=[("ascii_folding", None)]) == \
        ["strasse", "gross"]


# ============================================================
# token_trim_filter.out — Unicode whitespace trim
# ============================================================

def test_trim_ascii():
    assert _toks("this is a test.", tokenizer="keyword",
                 filters=[("trim", None)]) == ["this is a test."]
    assert _toks("   ", tokenizer="keyword",
                 filters=[("trim", None)]) == []


def test_trim_unicode_whitespace():
    # NBSP (U+00A0) and ideographic space (U+3000) strip too
    assert _toks(" foo ", tokenizer="keyword", lowercase=False,
                 filters=[("trim", None)]) == ["foo"]
    assert _toks("　漢字　", tokenizer="keyword", lowercase=False,
                 filters=[("trim", None)]) == ["漢字"]


def test_trim_jvm_twin(spark):
    """The JVM filter chain trims the same Unicode whitespace."""
    from pyspark.sql import functions as F
    from sparksearch.analysis import analyzer_expr
    cfg = FieldConfig(name="s", tokenizer="keyword", lowercase=False,
                      filters=[("trim", None)])
    df = spark.createDataFrame(
        [(" foo ",), ("　漢字　",), ("   ",)],
        "s string")
    got = [r[0] for r in
           df.select(F.transform(analyzer_expr(F.col("s"), cfg),
                                 lambda x: x["t"])).collect()]
    assert got == [["foo"], ["漢字"], []]


def test_whitespace_tokenizer_unicode_split(spark):
    """whitespace splits on Unicode whitespace in BOTH twins."""
    from pyspark.sql import functions as F
    from sparksearch.analysis import _jvm_token_array
    text = "a b　c d"
    assert py_tokenize(text, "whitespace") == ["a", "b", "c", "d"]
    df = spark.createDataFrame([(text,)], "s string")
    cfg = FieldConfig(name="s", tokenizer="whitespace")
    got = df.select(_jvm_token_array(F.col("s"), cfg)).collect()[0][0]
    assert got == ["a", "b", "c", "d"]
