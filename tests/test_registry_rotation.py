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
    """Only SUCCESSFUL rows count as checked (r4 lesson: an errored row
    must re-float into the next window, not be filed as done forever)."""
    (tmp_path / "CORRECTNESS_r09.json").write_text(
        json.dumps(
            {
                # green: hash matched
                "q_green": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                },
                # rows-only by design (no oracle_sql entry) — checked
                "q_rows_only": {
                    "rows_match": None,
                    "hash_match": None,
                    "spark_rows": 5,
                    "err": "no_oracle",
                },
                # ERRORED in the driver harness — must NOT count
                "q_err": {
                    "rows_match": None,
                    "hash_match": None,
                    "err": "TypeError: unhashable type: 'list'",
                },
                # value mismatch — must NOT count (needs a re-check)
                "q_mismatch": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": False,
                    "err": None,
                },
                # legacy reduced row: rows matched, no hash field at all
                "q_legacy": {"rows_match": True},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text("not json {")
    got = registry._driver_checked_names(str(tmp_path))
    assert got == {"q_green", "q_rows_only", "q_legacy"}


def test_err_row_refloats_synthetic(tmp_path):
    """An errored row must NOT count as checked (so the name re-floats).

    r5 lesson: NEVER assert the transient state of the LIVE driver
    artifacts here — a test pinning "name X is still unchecked" expires
    the moment the driver lands X's green row (the intended outcome) and
    turns the gate red. Synthetic fixtures only.
    """
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_err": {"rows_match": None, "hash_match": None,
                              "err": "TypeError: unhashable type: 'list'"}})
    )
    assert registry._driver_checked_names(str(tmp_path)) == set()
    # a later green row for the same name files it as checked
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_err": {"rows_match": True, "schema_match": True,
                              "hash_match": True, "err": None}})
    )
    assert registry._driver_checked_names(str(tmp_path)) == {"q_err"}


def test_deferred_names_trail_the_unchecked_block():
    checked = registry._driver_checked_names()
    names = list(registry.QUERIES)
    unchecked = [n for n in names if n not in checked]
    live_defer = [n for n in registry._DRIVER_WINDOW_DEFER if n not in checked]
    if live_defer:
        assert unchecked[-len(live_defer) :] == live_defer


def test_green_rounds_keep_latest(tmp_path):
    """_driver_green_rounds must record the LATEST green round per name
    (freshness key for the steady-state rotation — a re-confirmed name
    drops to the back of the backlog), ignoring failed rows."""
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({
            "q_a": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
            "q_b": {"rows_match": None, "hash_match": None, "err": "boom"},
        })
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({
            "q_a": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
            "q_b": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
        })
    )
    got = registry._driver_green_rounds(str(tmp_path))
    assert got == {"q_a": 5, "q_b": 5}


def test_all_green_steady_state_refloats_oldest():
    """Once every query is checked, the window must fill with the names
    whose most-recent confirmation is OLDEST (true rotation: a name
    re-confirmed last round drops to the back), never no-op. Pinned on
    the LIVE ordering restricted to the checked block — consistent by
    construction since both sides read the same green map."""
    green = registry._driver_green_rounds()
    names = list(registry.QUERIES)
    # semantics-changed names are force-floated ahead of the backlog and
    # exempt from the stalest-first ordering
    done = [
        n
        for n in names
        if n in green and n not in registry._DRIVER_WINDOW_RECHECK
    ]
    rounds = [green[n] for n in done]
    # the checked block is sorted stalest-first
    assert rounds == sorted(rounds)
    # steady-state simulation: with nothing unchecked, the window would
    # be the head of the checked block = the minimum-round names
    if done:
        window = done[:50]
        cutoff = max(green[n] for n in window)
        assert all(green[n] >= cutoff for n in done[50:])
