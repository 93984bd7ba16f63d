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


def run(name: str, cmd: list[str], env: dict | None = None) -> bool:
    t0 = time.time()
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    full_env = dict(os.environ, **env) if env else None
    r = subprocess.run(cmd, cwd=REPO, env=full_env)
    ok = r.returncode == 0
    print(f"=== {name}: {'PASS' if ok else f'FAIL rc={r.returncode}'} [{time.time() - t0:.0f}s]", flush=True)
    return ok


# Every oracle-paired query is BIT-EXACT cross-engine as of round 5
# (verify_local --strict passes the full catalog), so --deep runs
# strict over EVERYTHING.  This list is the subset that ALSO reruns
# under a non-UTC JVM timezone — the queries with date/timestamp
# predicates or decimal-sum aggregates, the two environment axes that
# produced round 4's driver-only hash mismatches (tpch_q1 / tpch_q12).
EXACT_FAMILY = [
    "tpch_q1_pricing_summary", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_late_lines", "tpch_q14_promo_effect",
    "tpch_q18_large_orders", "tpch_q20_dominant_supplier",
    "tpch_q21_waiting_supplier", "table_fingerprint_orders",
    "grouped_audit", "running_total", "flagship_revenue_by_nation",
    # round-5 additions with timestamp predicates (epoch-difference
    # lookbacks — TZ-invariant by construction; rerun proves it)
    "attribution_first_touch", "attribution_last_touch",
    "attribution_linear", "attribution_time_decay",
    "attribution_u_shaped",
    # every timestamp-EMITTING streaming query (round-5 judge defect:
    # streamed window/session/asof instants rendered in the session
    # zone; now emitted as UTC wall-clock NTZ via _wallclock_ntz —
    # this rerun is the regression tripwire)
    "stream_tumbling_window", "stream_quantile_window",
    "stream_psi_window", "stream_sessionize", "stream_asof_join",
    "stream_distinct_window", "stream_ewma",
    # round-6 timestamp-touching batch additions (NTZ-out by
    # construction; rerun proves it)
    "rolling_features_events", "seasonal_anomalies_events",
    "changepoint_events_value", "transition_matrix_events",
    "stream_seasonal_gate", "decompose_events_value",
    "twap_events_user", "conversion_latency_events",
    "asof_nearest_events", "coalesce_intervals_events",
    "gap_report_events", "stream_gap_report",
    "pit_join_orders_segment",
    # round-6 session-2 additions that touch timestamps (day-space
    # recency/day-index/risk durations, NTZ max_ts + µs lag, emitted
    # event times) — rerun proves session-zone invariance
    "rfm_segments_events", "km_risk_table_events",
    "cumulative_distinct_events", "ewma_events_value",
    "holt_forecast_events", "linear_trend_user_daily",
    "bounded_stock_events", "freshness_events_by_type",
    "keep_latest_orders", "rolling_corr_supplier", "histogram2d_events",
    "abc_parts_revenue", "calendar_features_events",
    # round-7 additions that touch timestamps/dates (hourly bucket
    # indices from wall-clock epoch ms, NTZ period cutoffs, DATE
    # bucket shifting, calendar extraction, as-of dimension cuts,
    # moving/trailing prefix-frame rewrites) — rerun proves
    # session-zone invariance
    "acf_events_value", "xcf_click_purchase", "cuped_events",
    "mix_shift_events_value", "growth_accounting_weekly",
    "decomposition_strength_events", "date_dimension_2024",
    "scd2_snapshot_orders", "golden_record_customers",
    "moving_sum_1h", "resample_hourly_ffill", "resample_hourly_interp",
    "asof_join", "stream_rate_monitor",
    # rounds 7-8 stragglers claiming bit-exactness through decimal
    # sums or content-keyed hashes (no timestamps, but the TZ rerun
    # doubles as a second-session determinism tripwire), plus the
    # four round-7 driver-mismatch queries — permanent members
    "gini_by_priority", "negative_samples_orders",
    "stratified_sample_n_orders", "surrogate_key_orders",
    "pipeline_spec_orders", "lorenz_orders_totalprice",
    "join_cardinality_lineitem_partkey",
    # round-8 additions touching timestamps or claiming losslessness
    "temporal_split_events", "prefix_jaccard_docs",
    "tpch_q5_local_supplier_volume", "frequent_sequences_events",
    "cramers_v_events", "pareto_front_orders", "containment_pairs_docs",
    "classification_report_orders", "retrieval_metrics_events",
    "bootstrap_ci_events_value", "mann_whitney_events",
    "kruskal_wallis_events", "effect_size_purchase_vs_view",
    "brown_forsythe_events", "paired_t_events_purchase_click",
    "bootstrap_ci_by_type", "trimmed_mean_events_value",
    "trimmed_mean_by_priority", "concentration_orders_by_priority",
    # round-9: the remaining two driver-mismatch queries (bit-exact
    # claims, decimal sums); round-10 retired the answered bisection
    # twins, keeping the two permanent decimal-presentation sentinels
    "weighted_median_lineitem", "wow_revenue_orders",
    "bx_cast_orders", "bx_floor_cents_orders",
    # round-10: money surfaces re-expressed as scaled BIGINT cents
    # (the bisection conclusion) — rerun proves the cents formula and
    # the decimal*100 presentation stay bit-exact cross-session
    "cohort_ltv_orders", "fifo_match_events", "orc_roundtrip_orders",
    # round-10 new operators claiming bit-exactness
    "mcnemar_events", "cochran_q_events", "kendall_tau_daily_revenue",
    "srm_orders_priority", "dunn_events_value", "stream_srm_window",
    "fleiss_kappa_events", "vocab_richness_docs",
    "capture_recapture_orders", "diversity_docs_by_source",
    "friedman_events_spend",
    # round-9 new operators claiming bit-exactness
    "nelson_aalen_events", "mann_kendall_daily_revenue",
    "snapshot_restore_orders", "uplift_curve_events",
    "weighted_p90_lineitem", "cochran_armitage_orders",
    "spearman_by_returnflag",
    "spearman_lineitem_qty_price", "fdr_bh_customers",
    "fdr_holm_customers", "conformal_events_value",
    "conformal_by_segment_events", "divergence_purchase_vs_click",
    "stream_divergence_window",
]


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
        ("oracle_type_audit (dtype parity)",
         [py, os.path.join(HERE, "oracle_type_audit.py")]),
    ]
    if deep:
        layers += [
            ("verify_local --vanilla (driver fidelity)",
             [py, os.path.join(HERE, "verify_local.py"), "--vanilla"]),
            ("verify_local --strict (bit-exact, all queries)",
             [py, os.path.join(HERE, "verify_local.py"), "--strict"]),
            ("verify_local --vanilla, TZ=America/New_York (exact family)",
             [py, os.path.join(HERE, "verify_local.py"), "--vanilla", *EXACT_FAMILY],
             {"TZ": "America/New_York"}),
        ]
        os.environ["PROP_EXAMPLES"] = "40"
        layers += [
            ("property fuzz (PROP_EXAMPLES=40)",
             [py, "-m", "pytest", "tests/test_property.py", "-q"]),
        ]
    failed = [spec[0] for spec in layers if not run(*spec)]
    if failed:
        print(f"\nGATE FAILED: {', '.join(failed)}")
        return 1
    print("\nGATE CLEAN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
