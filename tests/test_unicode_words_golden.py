"""unicode_words.out golden (PUBLIC reference behavior): the
unicode_words tokenizer keeps interior apostrophes (it's, paul's),
emits emoji as standalone searchable tokens (adjacent emoji split into
one token each, ZWJ sequences and flag pairs stay single tokens), and
``remove_emojis`` strips them.
Ref: pg_search/tests/pg_regress/expected/unicode_words.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index
from sparksearch.analysis import py_tokenize
from sparksearch.query import ast
from sparksearch.query.compiler import compile_query

TEXT = "it's Paul's birthday today!  \U0001F382\U0001F6A8\U0001F440\U0001F95C"
LONG = TEXT + "\U0001F6DC\U0001FAE8\U0001FAE9"


def test_unicode_words_tokens():
    # unicode_words.out:38-41 — apostrophe words + one token per emoji
    assert py_tokenize(LONG, "unicode_words", {}, True) == [
        "it's", "paul's", "birthday", "today",
        "\U0001F382", "\U0001F6A8", "\U0001F440", "\U0001F95C",
        "\U0001F6DC", "\U0001FAE8", "\U0001FAE9"]


def test_unicode_words_remove_emojis():
    # unicode_words.out:43-46
    assert py_tokenize(LONG, "unicode_words",
                       {"remove_emojis": True}, True) == \
        ["it's", "paul's", "birthday", "today"]


def test_unicode_words_zwj_and_flags():
    # ZWJ profession sequences and regional-indicator flags are single
    # tokens (the reference's emoji matrix rows)
    toks = py_tokenize("\U0001F469‍⚕️ \U0001F1FA\U0001F1F8",
                       "unicode_words", {}, True)
    assert toks == ["\U0001F469‍⚕️", "\U0001F1FA\U0001F1F8"]


def test_emoji_searchable(spark):
    # unicode_words.out:30-35 — WHERE t @@@ '🚨' finds the row
    df = spark.createDataFrame([(1, TEXT)], "id long, t string")
    idx = build_index(df, IndexSchema(
        key_field="id",
        text_fields=[FieldConfig(name="t", tokenizer="unicode_words")]))
    got = {r["doc_id"] for r in
           compile_query(idx, ast.Term("t", "\U0001F6A8")).collect()}
    assert got == {1}
