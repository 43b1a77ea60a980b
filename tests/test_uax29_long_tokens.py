"""Long-token safety of the unicode_words analyzer (now the default
for unconfigured text fields): java.util.regex recursion must be
bounded by interior-joiner count, not character count — a per-char
alternation form StackOverflowed executors on multi-KB tokens and took
the whole JVM down (SparkUncaughtExceptionHandler exits on executor
StackOverflowError in local mode)."""

import pytest
from pyspark.sql import functions as F

from sparksearch.analysis import _JAVA_UAX29, _PY_UAX29, py_tokenize


CASES = [
    ("J.K. Rowling", ["j.k", "rowling"]),
    ("don't stop", ["don't", "stop"]),
    ("1,000.5 items", ["1,000.5", "items"]),
    ("a..b c.", ["a", "b", "c"]),
    ("contact@techcorp.com wireless", ["contact", "techcorp.com",
                                       "wireless"]),
    # '_' is ExtendNumLet: joins words, survives in the raw segment
    ("PROJECT_ALPHA review", ["project_alpha", "review"]),
    ("_foo bar_ __", ["_foo", "bar_"]),
    ("foo_.bar", ["foo_", "bar"]),  # '.' joins only ALetter × ALetter
    ("1_000 a_b_c", ["1_000", "a_b_c"]),
    ("3.a x.5", ["3", "a", "x", "5"]),  # no Numeric×MidNumLet×ALetter rule
]


def test_py_twin_tokens():
    for text, want in CASES:
        assert _PY_UAX29.findall(text.lower()) == want, text
    assert py_tokenize("J.K. Rowling", "unicode_words") == \
        ["j.k", "rowling"]


def test_jvm_long_token_no_stack_overflow(spark):
    """20k-char token and a 5k-joiner token must tokenize, not crash."""
    rows = [("x" * 20000,), (("a." * 5000) + "a",)]
    df = spark.createDataFrame(rows, "t string")
    out = df.select(F.regexp_extract_all(
        F.lower("t"), F.lit(_JAVA_UAX29), 0).alias("a")).collect()
    assert len(out[0]["a"]) == 1 and len(out[0]["a"][0]) == 20000
    assert len(out[1]["a"]) >= 1  # joiner cap splits, never crashes
    # twins agree on the pathological inputs too
    for (t,), row in zip(rows, out):
        assert _PY_UAX29.findall(t.lower()) == list(row["a"])


def test_jvm_py_twin_parity(spark):
    texts = [t for t, _ in CASES]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(F.regexp_extract_all(
        F.lower("t"), F.lit(_JAVA_UAX29), 0).alias("a")).collect()
    for (t, want), row in zip(CASES, got):
        assert list(row["a"]) == want, t
