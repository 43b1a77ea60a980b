"""index_layer_info.out golden (PUBLIC reference behavior): the
pdb.index_layer_info bucket rows and paradedb.combined_layer_sizes —
the sorted union of the foreground layer_sizes and
background_layer_sizes options, rendered as pg_size_pretty intervals
largest-first ('10000 MB..' ... '..100 kB'); '0' disables a list.

Ref: pg_search/tests/pg_regress/expected/index_layer_info.out
"""

from sparksearch.api import (combined_layer_sizes, index_layer_info,
                             pg_size_pretty)

DEFAULT = "100kb, 1mb, 10mb, 100mb, 1000mb, 10000mb"


def _rows(name, fg, bg=None):
    return [r["layer_size"]
            for r in index_layer_info(name, combined_layer_sizes(fg, bg))]


def test_default_layer_buckets():
    assert _rows("mock_items_1_idx", DEFAULT) == [
        "10000 MB..", "1000 MB..10000 MB", "100 MB..1000 MB",
        "10 MB..100 MB", "1024 kB..10 MB", "100 kB..1024 kB", "..100 kB"]


def test_combined_default():
    assert combined_layer_sizes(DEFAULT) == [
        102400, 1048576, 10485760, 104857600, 1048576000, 10485760000]


def test_foreground_disabled_background_only():
    """layer_sizes='0' + background '10kb, 100kb, 1mb, 100mb'."""
    assert combined_layer_sizes("0", "10kb, 100kb, 1mb, 100mb") == [
        10240, 102400, 1048576, 104857600]
    assert _rows("mock_items_1_idx", "0", "10kb, 100kb, 1mb, 100mb") == [
        "100 MB..", "1024 kB..100 MB", "100 kB..1024 kB",
        "10 kB..100 kB", "..10 kB"]


def test_union_dedups():
    """fg '10kb, 100kb' ∪ bg '10kb, 100kb, 1mb, 100mb, 1gb'."""
    assert _rows("mock_items_1_idx", "10kb, 100kb",
                 "10kb, 100kb, 1mb, 100mb, 1gb") == [
        "1024 MB..", "100 MB..1024 MB", "1024 kB..100 MB",
        "100 kB..1024 kB", "10 kB..100 kB", "..10 kB"]


def test_pg_size_pretty_thresholds():
    assert pg_size_pretty(102400) == "100 kB"
    assert pg_size_pretty(1048576) == "1024 kB"       # < 10240 kB stays kB
    assert pg_size_pretty(10485760) == "10 MB"
    assert pg_size_pretty(10485760000) == "10000 MB"  # < 10240 MB stays MB
    assert pg_size_pretty(1073741824) == "1024 MB"
    assert pg_size_pretty(512) == "512 bytes"
