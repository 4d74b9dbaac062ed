"""bench.py contract hygiene (no Spark needed).

- Every FLOORS key must name a registered query (a rename would
  silently orphan its floor and disable the re-time-on-suspicion rule).
- Every HEADLINE name must be registered.
- The bench name list logic must cover the FULL registry exactly once
  (r6 VERDICT task #3: n_queries == registry size).
"""

from __future__ import annotations

import bench
from etl_mini_dw_spark.registry import QUERIES


def test_floors_reference_registered_queries():
    orphans = [n for n in bench.FLOORS if n not in QUERIES]
    assert not orphans, orphans


def test_headline_is_registered():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing


def test_bench_names_cover_full_registry_once():
    names = [n for n in bench.HEADLINE if n in QUERIES]
    names += [n for n in sorted(QUERIES) if n not in names]
    assert sorted(names) == sorted(QUERIES)
    assert len(names) == len(set(names))
