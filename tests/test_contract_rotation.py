"""Contract-window auto-rotation (sparksearch.contract.rotated_queries).

The driver verifies the FIRST 50 entries of ``__spark_entry__.queries()``
each round; rotation orders entries by staleness against the committed
CORRECTNESS_r*.json artifacts so the window always re-verifies the
least-recently-checked entries (round-3 verdict ask #2, made permanent).
"""

import glob
import json
import os

from sparksearch import contract

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_checked() -> dict:
    latest = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, -1), rnd)
    return latest


def test_rotation_preserves_key_set():
    assert set(contract.rotated_queries()) == set(contract.QUERIES)


def test_rotation_orders_by_staleness():
    latest = _latest_checked()
    names = list(contract.rotated_queries())
    keys = [latest.get(n, -1) for n in names]
    assert keys == sorted(keys), "entries must be ascending in latest-checked round"


def test_never_checked_entries_lead_the_window():
    latest = _latest_checked()
    names = list(contract.rotated_queries())
    never = [n for n in names if n not in latest]
    # every never-driver-checked entry must sit inside the 50-entry window
    assert all(names.index(n) < 50 for n in never)


def test_rotation_is_stable_within_equal_staleness():
    latest = _latest_checked()
    names = list(contract.rotated_queries())
    base = list(contract.QUERIES)
    for rnd in set(latest.values()) | {-1}:
        tier = [n for n in names if latest.get(n, -1) == rnd]
        assert tier == sorted(tier, key=base.index), f"tier {rnd} not stable"


def test_window_covers_every_aged_entry():
    """Round-4 verdict ask #2 made checkable: every entry whose latest
    driver check is OLDER than the newest round must land inside the
    next 50-entry window, so the r{N}+r{N+1} union always covers the
    whole contract while entries stay ≤1 round stale."""
    latest = _latest_checked()
    if not latest:
        return
    names = list(contract.rotated_queries())
    newest = max(latest.values())
    aged = [n for n in names if latest.get(n, -1) < newest]
    assert len(aged) <= 50, (
        f"{len(aged)} aged entries exceed the 50-slot window — the "
        "contract grew past 2-round coverage; shrink or split")
    assert all(names.index(n) < 50 for n in aged)


def test_entrypoint_exposes_rotated_order():
    import __spark_entry__ as e
    assert list(e.queries()) == list(contract.rotated_queries())
    oracles = e.oracle_sql()
    assert set(oracles) == set(contract.oracle_sql())
