"""Instant-vs-NTZ output sweep over the ENTIRE query catalog.

Round-5 judge defect class: a query whose OUTPUT column is
instant-typed ``timestamp`` renders its collected wall-clock in the
session timezone, so the same data hashes differently on a UTC driver
host vs a zoned one — while the DuckDB oracle's TZ-free arithmetic
never moves.  The testdata timestamps are TIMESTAMP_NTZ, so the
engine-wide contract is **NTZ in ⇒ NTZ out**: every event-time output
must be wall-clock typed (``timestamp_ntz`` or ``date``), never an
instant, unless a query is explicitly allowlisted here with a
justification.

This test makes reintroducing the class impossible: it walks every
registered query's schema (``BUBBLES_SCHEMA_ONLY=1`` keeps eager
checkpoints lazy; streaming sinks still drain at sf0.001) and fails on
any instant-typed ``timestamp`` — including one nested inside a
struct/array — naming the query and column.
"""

from __future__ import annotations

import re

import pytest

SF0001 = "/root/testdata/sf0.001"

# query -> justification; keep EMPTY unless a query genuinely consumes
# an instant-typed source (none of the testdata tables do)
ALLOWLIST: dict[str, str] = {}

# "timestamp" not followed by "_ntz" — catches struct<start:timestamp,...>
_INSTANT = re.compile(r"timestamp(?!_ntz)")


def test_no_instant_timestamp_outputs(spark, monkeypatch):
    monkeypatch.setenv("BUBBLES_SCHEMA_ONLY", "1")
    import __spark_entry__ as entrymod

    offenders: list[str] = []
    errors: list[str] = []
    for name, fn in entrymod.queries().items():
        if name in ALLOWLIST:
            continue
        try:
            sdf = fn(spark, SF0001)
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        bad = [c for c, t in sdf.dtypes if _INSTANT.search(t)]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not errors, "queries failed to build a plan:\n" + "\n".join(errors)
    assert not offenders, (
        "instant-typed timestamp outputs (render in the session zone; "
        "emit TIMESTAMP_NTZ wall-clock instead — see "
        "streaming/events._wallclock_ntz):\n" + "\n".join(offenders)
    )
