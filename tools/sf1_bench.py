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

Usage: python tools/sf1_bench.py [N] [SF1_DIR] [name ...]
       (default 40 /tmp/sf1; explicit names replace the top-N pick)
Prints one JSON line {query: {"t01": s, "t1": s, "alpha": a}}.
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"

    import __spark_entry__ as entrymod
    from bubbles_spark.session import get_spark

    spark = get_spark("bubbles_spark_sf1_bench")
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
    if len(sys.argv) > 3:
        top = [q for q in sys.argv[3:] if q in qs]

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    run("flagship_revenue_by_nation", SF01)  # warm-up

    results: dict[str, dict] = {}
    for name in top:
        try:
            run(name, SF01)
            t01 = run(name, SF01)
            run(name, sf1)
            t1 = run(name, sf1)
        except Exception as exc:  # noqa: BLE001 — record and continue
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:160]}
            print(f"# ERROR {name}: {results[name]['error']}", file=sys.stderr)
            continue
        alpha = math.log10(max(t1, 1e-3) / max(t01, 1e-3))
        results[name] = {
            "t01": round(t01, 2),
            "t1": round(t1, 2),
            "alpha": round(alpha, 2),
        }
        flag = "  <-- SUPER-LINEAR" if alpha > 1.3 else ""
        print(
            f"# {name}: sf0.1={t01:.2f}s sf1={t1:.2f}s alpha={alpha:.2f}{flag}",
            file=sys.stderr,
        )

    print(json.dumps({"k": 10, "sf1_dir": sf1, "queries": results}))
    worst = max(
        (r["alpha"] for r in results.values() if "alpha" in r), default=0.0
    )
    return 0 if worst <= 2.0 and not any(
        "error" in r for r in results.values()
    ) else 1


if __name__ == "__main__":
    sys.exit(main())
