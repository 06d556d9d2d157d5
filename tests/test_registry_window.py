"""The driver's 50-entry correctness-window contract (__spark_entry__.py).

The external correctness driver evaluates only the FIRST 50 ``queries()``
entries per round, so registration order is load-bearing: a reorder can
silently strand a never-verified query outside the window (ADVICE r3 item).
These tests pin the contract against the committed CORRECTNESS_r0N.json
records — no Spark session needed.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRIVER_WINDOW = 50


def _registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql(), e.ROWS_ONLY


def _green_rows_of_record() -> set[str]:
    """Query names holding a green driver row in any committed round:
    hash_match=true (full value check), or the explicit rows-only record
    (err='no_oracle' with a spark row count)."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                green.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                green.add(name)
    return green


def test_every_entry_has_oracle_or_explicit_rows_only_marker():
    qs, osql, rows_only = _registry()
    for name in qs:
        has_sql = name in osql
        assert has_sql != (name in rows_only), (
            f"{name}: must have oracle SQL XOR a ROWS_ONLY entry explaining "
            "why the value check is impossible"
        )
    # a stale marker for a query that gained an oracle is also a failure
    assert set(rows_only) <= set(qs)


def test_unverified_queries_sit_inside_driver_window():
    qs, _osql, _ = _registry()
    names = list(qs)
    window = set(names[:DRIVER_WINDOW])
    green = _green_rows_of_record()
    stranded = [n for n in names if n not in green and n not in window]
    assert not stranded, (
        f"queries with no green driver row of record rotated OUT of the "
        f"first {DRIVER_WINDOW} entries: {stranded} — reorder registration "
        "in __spark_entry__.py"
    )


def test_oracle_harness_is_derived_from_registry():
    """Rotation moves queries OUT of the driver's window but must never
    move them out of local verification: the oracle harness's parametrize
    list has to be derived from the live registry (every oracled query,
    including rotated-out ones), not a hand-maintained copy (VERDICT r4
    item 5)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import test_oracle_local as harness

    qs, osql, rows_only = _registry()
    covered = set(harness.all_query_names())
    assert covered == set(osql), (
        "oracle harness list drifted from the registry: "
        f"missing={set(osql) - covered} extra={covered - set(osql)}"
    )
    assert covered == set(qs) - set(rows_only)


def test_rotated_out_queries_hold_green_records():
    qs, _osql, _ = _registry()
    names = list(qs)
    green = _green_rows_of_record()
    rotated = [n for n in names[DRIVER_WINDOW:]]
    missing = [n for n in rotated if n not in green]
    assert not missing, (
        f"rotated-out queries lack a committed green row of record: {missing}"
    )
