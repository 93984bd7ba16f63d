"""Driver-contract tests: queries()/oracle_sql() shape and the
self-rotating correctness window (never-passed queries first)."""

from __future__ import annotations

import json


def test_driver_checked_rounds_counts_only_passes(tmp_path):
    import __spark_entry__ as e

    rows = {
        "passed": {"rows_match": True, "hash_match": True, "err": None},
        "failed": {"rows_match": False, "hash_match": False, "err": None},
        "errored": {"rows_match": None, "hash_match": None, "err": "boom"},
        "no_oracle": {"rows_match": None, "hash_match": None, "err": "no_oracle"},
        "rows_only": {"rows_match": True, "hash_match": None, "err": None},
    }
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(rows))
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"passed": {"rows_match": True, "hash_match": True, "err": None}})
    )
    got = e._driver_checked_rounds(str(tmp_path))
    # pass rows count (latest round wins); rows-only weak checks count;
    # failures / errors / missing oracles do NOT
    assert got == {"passed": 5, "rows_only": 5}


def test_queries_rotation_puts_unchecked_first():
    import __spark_entry__ as e

    allq = list(e.queries())
    assert len(allq) == len(set(allq))
    oracles = e.oracle_sql()
    # oracle-less queries can never record a driver pass: they must
    # sit at the very back, never burning bounded-window slots
    oracleless = [n for n in allq if n not in oracles]
    assert allq[len(allq) - len(oracleless):] == oracleless
    checked = e._driver_checked_rounds()
    # surface-changed queries are deliberately re-windowed as if never
    # checked — the rotation must treat them as round 0
    checked = {n: r for n, r in checked.items() if n not in e._FORCE_RECHECK}
    if checked:
        hashable = [n for n in allq if n in oracles]
        last_checked_round = [checked.get(n, 0) for n in hashable]
        # within the hash-checkable group, never-checked (0) must form
        # a prefix before any checked query
        first_checked = next(
            (i for i, r in enumerate(last_checked_round) if r > 0),
            len(hashable),
        )
        assert all(r > 0 for r in last_checked_round[first_checked:])


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    # every callable takes (spark, sf_dir)
    import inspect

    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name
