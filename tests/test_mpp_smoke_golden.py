"""mpp_smoke.out GUC-surface parity (PUBLIC reference behavior): the
MPP knobs exist, carry the reference defaults (mpp_debug=off,
mpp_queue_size=8MB), accept standard byte units (kB/MB/GB), enforce
the 64kB..1GB bounds with an invalid-parameter error, and are no-ops
for query results (a trivial query still works with mpp_debug on).

Ref: pg_search/tests/pg_regress/expected/mpp_smoke.out
"""

import pytest

import sparksearch.config as cfg


@pytest.fixture(autouse=True)
def _reset():
    yield
    cfg.set(mpp_debug=False, mpp_queue_size="8MB")


def test_defaults():
    c = cfg.get()
    assert c.mpp_debug is False
    assert c.mpp_queue_size == "8MB"
    assert cfg.parse_byte_size(c.mpp_queue_size) == 8 * 1024**2


def test_toggle_debug_sticks():
    cfg.set(mpp_debug=True)
    assert cfg.get().mpp_debug is True
    cfg.set(mpp_debug=False)
    assert cfg.get().mpp_debug is False


def test_queue_size_byte_units():
    cfg.set(mpp_queue_size="32MB")
    assert cfg.get().mpp_queue_size == "32MB"
    cfg.set(mpp_queue_size="1GB")
    assert cfg.get().mpp_queue_size == "1GB"
    cfg.set(mpp_queue_size="8MB")
    assert cfg.get().mpp_queue_size == "8MB"
    assert cfg.parse_byte_size("64kB") == 64 * 1024


def test_queue_size_out_of_range_rejected():
    # GUC min=64kB, max=1GB — 4kB and 2GB both rejected, setting intact
    with pytest.raises(ValueError, match="mpp_queue_size"):
        cfg.set(mpp_queue_size="4kB")
    with pytest.raises(ValueError, match="mpp_queue_size"):
        cfg.set(mpp_queue_size="2GB")
    assert cfg.get().mpp_queue_size == "8MB"
    with pytest.raises(ValueError, match="invalid value"):
        cfg.set(mpp_queue_size="lots")


def test_debug_is_noop_for_results(spark):
    cfg.set(mpp_debug=True)
    assert spark.sql("SELECT 1 AS trivial_query_still_works") \
        .collect()[0][0] == 1
