"""Driver-contract implementation (re-exported by __spark_entry__.py).

- entry(spark): flagship star-join query on sf0.001.
- queries(): every registered SURVEY §2 key → (spark, sf_dir) callable.
- oracle_sql(): DuckDB twin for each oracle-checked key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from raster2points_spark.registry import load_all

SF0001 = "/root/testdata/sf0.001"

# The grading driver evaluates only the FIRST 50 ``queries()`` keys per
# round.  Cumulative driver-verified coverage = union of all round
# windows; after r10 362 of 363 then-registered keys had a driver
# grade and no key was red.
#
# The r15 window (VERDICT r14 #3: drain the full r7 cohort + 6 r8
# keys; tools/evidence_audit.py is the ordering source).  After r14
# the stale-<r9 tail is 91 keys (44×r7 + 47×r8); this window covers
# all 44 r7 keys plus 6 r8 keys, leaving the tail at exactly 41.
# Within the r8 six, the three keys RESTRUCTURED by the r15
# optimization pass (spatial_point_in_polygon — in-row crossing fold;
# embed_pq — in-row encode/ADC; dedup_near_recall — persisted truth)
# take the slots first so the driver re-proves the rewritten plans
# the same round they changed; the remaining three follow audit
# order.  The r15 keys changed this round that are NOT in the window
# (stat_ks_test r14, concurrency_peak r13, sim_ivf_recall r12,
# sink_zorder r12, bpe_apply r11, fn_cast r10, join_phonetic r9 and
# the local_df-touched raster keys, all r14) are covered by the
# committed full-registry 3-SF oracle diffs
# (reports/diff_oracle_r15_sf0.*.txt) and the r15 determinism sweeps;
# r16's window picks them up next.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- the full r7-era stale cohort (44 keys, audit order) ---
    "agg_kmv_set_ops",
    "agg_moments",
    "corr_spearman",
    "dq_expectations",
    "hierarchy_rollup",
    "ml_auc_roc",
    "ml_calibration_bins",
    "ml_decision_stump",
    "ml_linreg_normal",
    "ml_logreg_irls",
    "pipeline_entity_resolution",
    "pipeline_rag_index",
    "profile_drift_psi",
    "scan_pysource_stream",
    "skyline_pareto_front",
    "stat_bootstrap_se",
    "tpch_q1",
    "tpch_q2",
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "ts_autocorr",
    "ts_backtest_naive",
    "ts_cross_correlation",
    "ts_cusum_changepoint",
    "ts_ewma",
    "ts_interpolate_linear",
    "ts_ohlc",
    "ts_seasonal_decompose",
    "win_rolling_median",
    # --- 6 r8-era stale keys: the three r15-restructured ones first ---
    "spatial_point_in_polygon",
    "embed_pq",
    "dedup_near_recall",
    "dedup_containment",
    "dedup_embed",
    "dedup_semantic_cluster",
)


def _ordered():
    registry = load_all()
    prio = {k: i for i, k in enumerate(DRIVER_PRIORITY)}
    missing = [k for k in DRIVER_PRIORITY if k not in registry]
    if missing:
        raise KeyError(f"DRIVER_PRIORITY names unknown keys: {missing}")

    def rank(i, name, spec):
        if name in prio:
            return (0, prio[name])
        # oracle keys before rows-only/smoke; stable within each class
        return (1 if spec.check == "oracle" else 2, i)

    items = sorted(
        ((rank(i, n, s), n, s) for i, (n, s) in enumerate(registry.items()))
    )
    return {n: s for _, n, s in items}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 4-way broadcast star join + grouped revenue rollup —
    the reference's scan→mask→transform→sink shape applied to the
    relational corpus, exercising scan pruning, broadcast joins and
    partial aggregation in one plan."""
    registry = load_all()
    return registry["join_broadcast_star"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None and spec.check == "oracle"
    }
