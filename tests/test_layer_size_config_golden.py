"""layer_size_config.out golden (PUBLIC reference behavior): the
human-readable layer_sizes option parser — '1kb' = 1024, zero entries
dropped, negatives and malformed pieces error with the reference's
messages.

Ref: pg_search/tests/pg_regress/expected/layer_size_config.out
"""

import pytest

from sparksearch.api import parse_layer_sizes


def test_single_layer():
    assert parse_layer_sizes("1kb") == [1024]


def test_zero_layers_dropped():
    assert parse_layer_sizes("0kb, 10kb") == [10240]


def test_multiple_layers():
    assert parse_layer_sizes("1kb, 10kb, 100MB") == \
        [1024, 10240, 100 * 1024 * 1024]


def test_negative_errors():
    with pytest.raises(ValueError,
                       match="a single layer size must be non-negative"):
        parse_layer_sizes("-1kb")


def test_malformed_errors_with_verbatim_text():
    with pytest.raises(ValueError,
                       match=r'invalid size: " bob\'s your uncle"'):
        parse_layer_sizes("1kb, bob's your uncle")


def test_bare_bytes_and_case():
    assert parse_layer_sizes("1024") == [1024]
    assert parse_layer_sizes("1KB, 1Mb") == [1024, 1024 * 1024]
