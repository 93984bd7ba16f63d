"""sf1 full-vector scale run: the top-N sf0.1 bench queries timed at
BOTH sf0.1 and a synthesized sf1 (tools/make_sf1.py, k=10 key-offset
perturbed copies) in ONE session, reporting the 10x scale exponent
alpha = log10(t_sf1 / t_sf0.1) per query.

Per-op k=8 smokes (tools/scale_smoke.py) cannot see super-linear
interactions BETWEEN pipeline stages — shuffle spill, AQE plan flips,
broadcast-threshold crossings — which only a complete-query run above
sf0.1 exercises.  Protocol: flagship warm-up, then per query one cold
+ one reported warm run at sf0.1, then the same at sf1 (same session,
same JIT state, sf0.1 first so the sf1 reading is the warmer of the
two — conservative for alpha).

Usage: python tools/sf1_bench.py [--k K] [N] [SF1_DIR] [name ...]
       (default --k 10, 40 /tmp/sf1; explicit names replace the
       top-N pick; --k is the scaled dir's data multiple vs sf0.1,
       so --k 30 for an sf3 dir gives base-30 exponents and --k 100
       for sf10 gives base-100)
Prints one JSON line {query: {"t01": s, "t1": s, "alpha": a}}.

Sub-second floor (BASELINE.md's documented ~1.7x measurement-context
effect): a single warm rep of a <1s query gives noisy exponents near
the 1.3 flag threshold, so any side reading under 1s is re-timed to
the MINIMUM of 3 warm reps — mirroring the tools/rebench.py protocol.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    argv = sys.argv[1:]
    k = 10
    if argv and argv[0] == "--k":
        k = int(argv[1])
        argv = argv[2:]
    n = int(argv[0]) if len(argv) > 0 else 40
    sf1 = argv[1] if len(argv) > 1 else "/tmp/sf1"

    import __spark_entry__ as entrymod
    from bubbles_spark.session import get_spark

    spark = get_spark("bubbles_spark_sf1_bench")
    # split synthesized single-file tables at row-group grain
    # (make_sf1.py writes 16 MB row groups): without this the 128 MB
    # default gives sf10's 56 MB documents table ONE split — map
    # phases single-task at every scale and the exponent measures
    # single-thread growth instead of the cluster-realistic
    # parallelism-grows-with-data behavior
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    qs = entrymod.queries()

    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_results.json",
        )
    ) as f:
        committed = json.load(f)["queries"]
    top = [
        q
        for q, _ in sorted(committed.items(), key=lambda kv: -kv[1])
        if q in qs
    ][:n]
    if len(argv) > 2:
        top = [q for q in argv[2:] if q in qs]

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    def warm_min(name: str, sf_dir: str) -> float:
        """One warm rep; if it reads sub-second, the min of 3 warm
        reps (the rebench.py minimum protocol — single sub-second
        samples give untrustworthy exponents near the flag bar)."""
        t = run(name, sf_dir)
        if t < 1.0:
            t = min(t, run(name, sf_dir), run(name, sf_dir))
        return t

    run("flagship_revenue_by_nation", SF01)  # warm-up

    results: dict[str, dict] = {}
    for name in top:
        try:
            run(name, SF01)
            t01 = warm_min(name, SF01)
            run(name, sf1)
            t1 = warm_min(name, sf1)
        except Exception as exc:  # noqa: BLE001 — record and continue
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
            print(f"# ERROR {name}: {results[name]['error']}", file=sys.stderr)
            continue
        alpha = math.log10(max(t1, 1e-3) / max(t01, 1e-3)) / math.log10(k)
        results[name] = {
            "t01": round(t01, 2),
            "t1": round(t1, 2),
            "alpha": round(alpha, 2),
        }
        flag = "  <-- SUPER-LINEAR" if alpha > 1.3 else ""
        print(
            f"# {name}: sf0.1={t01:.2f}s sf_k{k}={t1:.2f}s alpha={alpha:.2f}{flag}",
            file=sys.stderr,
        )

    print(json.dumps({"k": k, "sf1_dir": sf1, "queries": results}))
    worst = max(
        (r["alpha"] for r in results.values() if "alpha" in r), default=0.0
    )
    return 0 if worst <= 2.0 and not any(
        "error" in r for r in results.values()
    ) else 1


if __name__ == "__main__":
    sys.exit(main())
