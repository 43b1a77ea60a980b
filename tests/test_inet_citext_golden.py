"""inet + citext field types — the last two reference SearchFieldType
variants (schema/mod.rs:287-288 Inet, mod.rs:87-95 citext-forced
lowercase normalizer), parity with pg_regress goldens ``inet.out`` and
``citext.out``.

- inet: one canonical-Postgres-form term per value ('192.168.000.001'
  == '192.168.0.1', '2001:0DB8::1' == '2001:db8::1', /32 suppressed);
  query constants canonicalize identically, so any spelling matches.
- citext: case-insensitive TEXT — the lowercase normalizer is FORCED
  even when config says otherwise; ||| (Match) is case-insensitive on
  both sides, === (raw Term) compares against the lowercased index term
  so uppercase needles miss; stored values keep original case.
"""

import pytest
from pyspark.sql import functions as F

from sparksearch import IndexSchema, FieldConfig, build_index
from sparksearch.analysis import py_canon_inet, py_tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query


def _ids(idx, q):
    return [r["doc_id"] for r in
            compile_query(idx, q).orderBy("doc_id").collect()]


# --- inet canonicalization ---------------------------------------------------

def test_py_canon_inet():
    assert py_canon_inet("192.168.0.1") == "192.168.0.1"
    assert py_canon_inet("192.168.000.001") == "192.168.0.1"
    assert py_canon_inet(" 10.0.0.1 ") == "10.0.0.1"
    # full-length netmask suppressed, shorter kept (PG display rules)
    assert py_canon_inet("192.168.0.1/32") == "192.168.0.1"
    assert py_canon_inet("192.168.0.0/24") == "192.168.0.0/24"
    # IPv6: lowercase + zero-run compression + leading-zero strip
    assert py_canon_inet("2001:0DB8::0001") == "2001:db8::1"
    assert py_canon_inet("2001:db8:0:0:0:0:0:1") == "2001:db8::1"
    assert py_canon_inet("::FFFF:10.0.0.1/128") == "::ffff:a00:1"
    with pytest.raises(ValueError, match="invalid input syntax for type"):
        py_canon_inet("not.an.ip")
    with pytest.raises(ValueError, match="invalid input syntax for type"):
        py_canon_inet("192.168.0.256")


def test_inet_tokenizer():
    assert py_tokenize("192.168.000.001", "inet") == ["192.168.0.1"]
    assert py_tokenize("2001:0DB8::1", "inet") == ["2001:db8::1"]
    assert py_tokenize("", "inet") == []
    assert py_tokenize(None, "inet") == []


def _inet_index(spark):
    df = spark.createDataFrame(
        [(1, "192.168.0.1"), (2, "10.0.000.002"), (3, "2001:0DB8::0001"),
         (4, "192.168.0.1"), (5, None)],
        "id long, ip string")
    return build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="ip", field_type="inet")]))


def test_inet_search_golden(spark):
    """inet.out: ``SELECT count(*) ... WHERE ip @@@ '192.168.0.1'`` — a
    parse-with-field over the inet term; any textual spelling of the
    same address matches (canonical dictionary terms)."""
    idx = _inet_index(spark)
    # the golden's exact query: one row per '192.168.0.1' doc
    n = compile_query(idx, ast.Parse("192.168.0.1", field="ip")).count()
    assert n == 2
    # non-canonical query spelling hits the same canonical term
    assert _ids(idx, ast.Term("ip", "192.168.000.001")) == [1, 4]
    assert _ids(idx, ast.Term("ip", "10.0.0.2")) == [2]
    # IPv6 — mixed case / uncompressed query vs uncompressed indexed
    assert _ids(idx, ast.Term("ip", "2001:db8::1")) == [3]
    assert _ids(idx, ast.Term("ip", "2001:0DB8:0:0:0:0:0:1")) == [3]
    # NULL rows never match, never error
    assert _ids(idx, ast.Term("ip", "127.0.0.1")) == []


# --- citext ------------------------------------------------------------------

_CITEXT_BASIC = [
    (1, "Hello World"), (2, "PostgreSQL Database"), (3, "ParadeDB Search"),
    (4, "Full Text Search"), (5, "Open Source")]


def _citext_index(spark, rows=None, **cfg_kw):
    df = spark.createDataFrame(rows or _CITEXT_BASIC, "id long, name string")
    return build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="name", field_type="citext",
                                 **cfg_kw)]))


def test_citext_case_insensitive_match(spark):
    """citext.out test 1: ||| matches regardless of query case."""
    idx = _citext_index(spark)
    for needle in ("hello", "HELLO", "Hello"):
        assert _ids(idx, ast.Match("name", needle)) == [1], needle
    assert _ids(idx, ast.Match("name", "search")) == [3, 4]
    assert _ids(idx, ast.Match("name", "nonexistent")) == []


def test_citext_score_parity_across_case(spark):
    """citext.out test 5: same BM25 score for 'quick' and 'QUICK'."""
    rows = [(1, "The Quick Brown Fox"), (2, "THE LAZY DOG"),
            (3, "quick brown fox jumps"), (4, "lazy dog sleeps")]
    idx = _citext_index(spark, rows)
    lo = {r["doc_id"]: r["score"] for r in
          compile_query(idx, ast.Match("name", "quick")).collect()}
    hi = {r["doc_id"]: r["score"] for r in
          compile_query(idx, ast.Match("name", "QUICK")).collect()}
    assert lo == hi and set(lo) == {1, 3}
    # ### phrase with citext, both cases
    assert _ids(idx, ast.TokenizedPhrase("name", "quick brown")) == [1, 3]
    assert _ids(idx, ast.TokenizedPhrase("name", "QUICK BROWN")) == [1, 3]
    # === exact raw term: index terms are lowercased, the raw needle is
    # NOT re-cased — uppercase/mixed-case queries miss (citext.out test 5)
    assert _ids(idx, ast.Term("name", "quick")) == [1, 3]
    assert _ids(idx, ast.Term("name", "QUICK")) == []
    assert _ids(idx, ast.Term("name", "Quick")) == []


def test_citext_null_and_empty(spark):
    """citext.out tests 2 + 7: NULLs/empty strings index no terms but
    stay fetchable with original values."""
    rows = [(1, "visible content"), (2, None), (3, "more content"),
            (4, None), (5, "final content"), (6, "")]
    idx = _citext_index(spark, rows)
    assert _ids(idx, ast.Match("name", "content")) == [1, 3, 5]
    stored = {r["id"]: r["name"] for r in idx.docs.collect()}
    assert stored[2] is None and stored[6] == ""
    assert stored[1] == "visible content"


def test_citext_unicode(spark):
    """citext.out test 6: unicode needles match case-insensitively."""
    rows = [(1, "Ångström"), (2, "Naïve"), (3, "Résumé"), (4, "Café")]
    idx = _citext_index(spark, rows)
    assert _ids(idx, ast.Match("name", "naïve")) == [2]
    assert _ids(idx, ast.Match("name", "résumé")) == [3]
    assert _ids(idx, ast.Match("name", "café")) == [4]
    assert _ids(idx, ast.Match("name", "ångström")) == [1]


def test_citext_groupby_preserves_original_case(spark):
    """citext.out test 8: GROUP BY over a citext column — matching is
    case-insensitive, returned bucket keys keep the stored case."""
    rows = [(1, "Alpha"), (2, "Beta"), (3, "Alpha"), (4, "Gamma"),
            (5, "Beta")]
    idx = _citext_index(spark, rows)
    matched = compile_query(idx, ast.Match("name", "alpha beta gamma"))
    got = (matched.join(idx.docs.select("id", "name"),
                        matched["doc_id"] == F.col("id"))
           .groupBy("name").agg(F.count("*").alias("cnt"))
           .orderBy("name").collect())
    assert [(r["name"], r["cnt"]) for r in got] == \
        [("Alpha", 2), ("Beta", 2), ("Gamma", 1)]


def test_citext_forces_lowercase_over_config():
    """mod.rs:87-95: citext overrides an explicit lowercase=False."""
    cfg = FieldConfig(name="x", field_type="citext", lowercase=False)
    assert cfg.lowercase is True
    # and the inet route picks the typed tokenizer
    assert FieldConfig(name="ip", field_type="inet").tokenizer == "inet"
    # but never stomps an explicit custom tokenizer
    assert FieldConfig(name="ip", field_type="inet",
                       tokenizer="keyword").tokenizer == "keyword"


def test_inet_term_contract_entry(spark):
    """The driver-facing inet_term oracle entry: two different
    non-canonical spellings ('010.0XX.000.001/32' row values vs
    '10.007.0.01' query literal) meet at the canonical term, and the
    match set is exactly doc_id % 50 == 7 over sf0.001 documents."""
    from sparksearch import contract
    got = sorted(r.doc_id for r in contract.QUERIES["inet_term"](
        spark, "/root/testdata/sf0.001").collect())
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(r.doc_id for r in
                  docs.filter(F.col("doc_id") % 50 == 7).collect())
    assert got == want and len(got) > 0


def test_citext_match_contract_entry(spark):
    """The driver-facing citext_match oracle entry: rows store the tag
    in three casings, the needle uses a fourth, and the match set is
    exactly doc_id % 25 == 7 over sf0.001 documents."""
    from sparksearch import contract
    got = sorted(r.doc_id for r in contract.QUERIES["citext_match"](
        spark, "/root/testdata/sf0.001").collect())
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(r.doc_id for r in
                  docs.filter(F.col("doc_id") % 25 == 7).collect())
    assert got == want and len(got) > 0
