"""The driver checks only the FIRST 50 queries() entries. The registry's
self-maintaining rotation must (a) keep this round's curated priority
window intact, (b) float never-driver-checked queries ahead of ones with
rows in any CORRECTNESS_r*.json, (c) ignore malformed files."""

from __future__ import annotations

import json

from etl_mini_dw_spark import registry


def test_priority_window_is_first_50():
    names = list(registry.QUERIES)
    assert names[:50] == registry._DRIVER_WINDOW_PRIORITY


def test_unchecked_precede_checked_after_window():
    names = list(registry.QUERIES)
    checked = registry._driver_checked_names()
    tail = names[50:]
    flags = [n in checked for n in tail]
    # once the checked block starts, it never flips back
    assert flags == sorted(flags)


def test_checked_names_reader(tmp_path):
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps({"q_a": {"rows_match": True}, "q_b": {"rows_match": False}})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text("not json {")
    got = registry._driver_checked_names(str(tmp_path))
    assert got == {"q_a", "q_b"}
