"""Gate-coverage invariant (round-2 judge ask #1).

Round-2 judging found the prose comment in ``plans/__init__.py``
claiming full official-gate coverage was FALSE: 8 of 105 registered
queries had never received a CORRECTNESS row. This test replaces the
prose with a computed invariant: every registered query must either
hold an official green row in some recorded ``CORRECTNESS_r*.json``
OR sit in the current round's gate (so the next gate run records its
row). No Spark session needed — pure registry/file arithmetic.
"""

from __future__ import annotations

import glob
import json
import os

import blockchain_data_engineering_spark.plans as plans

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _official_green_rows() -> set[str]:
    """Query names with a green row in any recorded driver gate run."""
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("err") is None and row.get("rows_match"):
                green.add(name)
    return green


def test_gate_is_exactly_50():
    assert len(plans.QUERIES) == 50
    assert list(plans.QUERIES) == plans.GATE_ORDER


def test_every_registered_query_has_or_will_get_an_official_row():
    registry = set(plans.QUERIES) | set(plans.EXTRA_QUERIES)
    covered = _official_green_rows() | set(plans.GATE_ORDER)
    never_gated = registry - covered
    assert not never_gated, (
        "queries with no official CORRECTNESS row and not in the current "
        f"gate (front-load them in GATE_ORDER): {sorted(never_gated)}"
    )


def test_front_loaded_queries_precede_already_rowed_ones():
    """Unrowed queries must occupy the FIRST gate slots — a row-capped
    gate truncates from the back, so burying an unrowed query behind
    already-green ones is how the r1/r2 coverage gap happened."""
    green = _official_green_rows()
    seen_rowed = False
    for name in plans.GATE_ORDER:
        if name in green:
            seen_rowed = True
        else:
            assert not seen_rowed, (
                f"unrowed gate query {name!r} appears after already-rowed "
                "queries; move it to the front of GATE_ORDER"
            )


def test_every_gate_query_has_an_oracle_or_documented_exemption():
    # every gate query should ship a DuckDB oracle (strong value-hash
    # check); list genuinely non-SQL-expressible exemptions here
    exempt: set[str] = set()
    missing = [
        n for n in plans.GATE_ORDER if n not in plans.ORACLES and n not in exempt
    ]
    assert not missing, f"gate queries without oracles: {missing}"
