"""test_tokenizer_params.out golden (PUBLIC reference behavior):
tokenizer options are validated per tokenizer — shared filter params
are accepted by every tokenizer, tokenizer-specific params (ngram's
min/max/prefix_only, regex's pattern, unicode_words' remove_emojis)
are accepted by theirs and REJECTED by the wrong tokenizer with the
reference's "Invalid option: 'X'. Allowed options: ..." error.

Ref: pg_search/tests/pg_regress/expected/test_tokenizer_params.out
"""

import pytest

from sparksearch import FieldConfig, IndexSchema, build_index


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(1, "hello world")],
                                 "id long, content string")


def _build(docs, **cfg):
    return build_index(docs, IndexSchema(
        key_field="id", text_fields=[FieldConfig(name="content", **cfg)]))


def test_shared_filters_accepted_everywhere(docs):
    # pdb.simple('lowercase=true','stemmer=English') etc.
    _build(docs, tokenizer="simple", filters=[("stemmer", "english")])
    _build(docs, tokenizer="whitespace", filters=["ascii_folding"])
    _build(docs, tokenizer="unicode_words", filters=["trim"])


def test_tokenizer_specific_params_accepted(docs):
    _build(docs, tokenizer="ngram",
           tokenizer_opts={"min_gram": 2, "max_gram": 4,
                           "prefix_only": True})
    _build(docs, tokenizer="regex", tokenizer_opts={"pattern": "[a-z]+"})
    _build(docs, tokenizer="unicode_words",
           tokenizer_opts={"remove_emojis": True})


def test_wrong_tokenizer_rejects_specific_params(docs):
    with pytest.raises(ValueError,
                       match=r"Invalid option: 'chinese_convert'\. "
                             r"Allowed options: "):
        _build(docs, tokenizer="simple",
               tokenizer_opts={"chinese_convert": "t2s"})
    with pytest.raises(ValueError,
                       match=r"Invalid option: 'chinese_convert'\."):
        _build(docs, tokenizer="ngram",
               tokenizer_opts={"min_gram": 2, "max_gram": 4,
                               "chinese_convert": "t2s"})
    with pytest.raises(ValueError, match=r"Invalid option: 'min'\."):
        _build(docs, tokenizer="simple", tokenizer_opts={"min": 2})
    with pytest.raises(ValueError,
                       match=r"Invalid option: 'language'\."):
        _build(docs, tokenizer="ngram",
               tokenizer_opts={"min_gram": 2, "max_gram": 4,
                               "language": "chinese"})
    with pytest.raises(ValueError,
                       match=r"Invalid option: 'prefix_only'\."):
        _build(docs, tokenizer="whitespace",
               tokenizer_opts={"prefix_only": True})


def test_ngram_error_lists_its_options(docs):
    # the Allowed list names the ngram-specific surface too
    with pytest.raises(ValueError,
                       match=r"max_gram.*min_gram.*prefix_only"):
        _build(docs, tokenizer="ngram",
               tokenizer_opts={"min_gram": 2, "max_gram": 4,
                               "language": "chinese"})


def test_unknown_filter_rejected(docs):
    with pytest.raises(ValueError,
                       match=r"Invalid option: 'bogus_filter'\."):
        _build(docs, tokenizer="simple", filters=["bogus_filter"])
