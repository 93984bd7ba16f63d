"""Pre-snapshot gate: the one command to run before committing a
round snapshot.

Round 2 shipped a regression (events.ts NTZ crash) because the last
verify run predated a testdata format change.  This gate closes that
hole: it runs the FULL local verification stack — pytest, the DuckDB
oracle mirror over every registered query, and the physical-plan
audit — and fails non-zero if any layer fails.

Usage:  python tools/gate.py [--fast | --deep]
  --fast skips pytest (verify_local + explain_audit only).
  --deep adds driver-fidelity layers: verify_local --vanilla (plain
         SparkSession, no engine configs) and a PROP_EXAMPLES=40
         property-fuzz pass.

Each layer runs as a subprocess so one layer's Spark session teardown
can't poison the next.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(name: str, cmd: list[str]) -> bool:
    t0 = time.time()
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    ok = r.returncode == 0
    print(f"=== {name}: {'PASS' if ok else f'FAIL rc={r.returncode}'} [{time.time() - t0:.0f}s]", flush=True)
    return ok


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    deep = "--deep" in sys.argv[1:]
    py = sys.executable
    layers = []
    if not fast:
        layers.append(("pytest", [py, "-m", "pytest", "tests/", "-q"]))
    layers += [
        ("verify_local (all queries)", [py, os.path.join(HERE, "verify_local.py")]),
        ("explain_audit", [py, os.path.join(HERE, "explain_audit.py")]),
    ]
    if deep:
        layers += [
            ("verify_local --vanilla (driver fidelity)",
             [py, os.path.join(HERE, "verify_local.py"), "--vanilla"]),
        ]
        os.environ["PROP_EXAMPLES"] = "40"
        layers += [
            ("property fuzz (PROP_EXAMPLES=40)",
             [py, "-m", "pytest", "tests/test_property.py", "-q"]),
        ]
    failed = [name for name, cmd in layers if not run(name, cmd)]
    if failed:
        print(f"\nGATE FAILED: {', '.join(failed)}")
        return 1
    print("\nGATE CLEAN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
