"""The driver checks only the FIRST 50 queries() entries. The registry's
self-maintaining rotation must (a) never spend a window slot on a query
that already has a driver row (while any unchecked remain), (b) put the
value-ranked seed names at the very front, (c) float never-checked
queries ahead of checked ones everywhere, (d) ignore malformed files."""

from __future__ import annotations

import json

from etl_mini_dw_spark import registry


def test_first_50_disjoint_from_driver_checked():
    names = list(registry.QUERIES)
    checked = registry._driver_checked_names()
    unchecked_total = sum(1 for n in names if n not in checked)
    window = names[: min(50, unchecked_total)]
    assert not (set(window) & checked), sorted(set(window) & checked)


def test_seed_names_lead_the_window():
    names = list(registry.QUERIES)
    checked = registry._driver_checked_names()
    live_seed = [n for n in registry._DRIVER_WINDOW_SEED if n not in checked]
    assert names[: len(live_seed)] == live_seed


def test_unchecked_precede_checked_globally():
    names = list(registry.QUERIES)
    checked = registry._driver_checked_names()
    flags = [n in checked for n in names]
    # once the checked block starts, it never flips back
    assert flags == sorted(flags)


def test_checked_names_reader(tmp_path):
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"q_a": {"rows_match": True}, "q_b": {"rows_match": False}})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text("not json {")
    got = registry._driver_checked_names(str(tmp_path))
    assert got == {"q_a", "q_b"}
