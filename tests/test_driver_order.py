"""Driver sample rotation: never-green entries rank first; proven
entries rotate least-recently-green first so the driver's front-50
draw re-verifies stale entries each round (round-7 verdict task 1).
"""

from __future__ import annotations

import json

import __spark_entry__ as entry_mod
from hstream_spark.queries import REGISTRY


def test_order_is_permutation_of_registry():
    order = entry_mod._driver_order()
    assert sorted(order) == sorted(REGISTRY)
    assert len(order) == len(set(order))


def test_fresh_entries_rank_before_proven(monkeypatch, tmp_path):
    names = list(REGISTRY)
    a, b, c = names[0], names[1], names[2]
    # a green in r01 only, b green in r03, c never green
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({a: {"hash_match": True}, b: {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({b: {"hash_match": True}, c: {"hash_match": False}})
    )
    monkeypatch.setattr(
        entry_mod.os.path, "dirname", lambda _p: str(tmp_path)
    )
    order = entry_mod._driver_order()
    # c (never green) and every other un-proven entry precede a and b
    assert order.index(c) < order.index(a) < order.index(b)
    # least-recently-green first among proven
    green = entry_mod._proven_green()
    assert green == {a: 1, b: 3}


def test_regressed_entry_ranks_fresh_again(monkeypatch, tmp_path):
    names = list(REGISTRY)
    a = names[0]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({a: {"hash_match": True}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({a: {"hash_match": False}})
    )
    monkeypatch.setattr(
        entry_mod.os.path, "dirname", lambda _p: str(tmp_path)
    )
    assert a not in entry_mod._proven_green()
    assert entry_mod._driver_order().index(a) < len(REGISTRY) - 1


def test_rows_only_entries_count_as_seen(monkeypatch, tmp_path):
    """A rows-only driver record counts as seen ONLY while the entry
    still has no oracle; once it gains one (round 8 upgraded all
    formerly rows-only entries), the old weak proof ranks it fresh so
    the driver re-verifies it hash-gated."""
    names = list(REGISTRY)
    a = names[0]
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({a: {"err": "no_oracle", "spark_rows": 7}})
    )
    monkeypatch.setattr(
        entry_mod.os.path, "dirname", lambda _p: str(tmp_path)
    )
    # entry has an oracle now → the rows-only record is stale evidence
    assert entry_mod._proven_green() == {}
    # same record while the entry is genuinely oracle-less → seen
    monkeypatch.setattr(REGISTRY[a], "oracle", None)
    assert entry_mod._proven_green() == {a: 2}
