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
# The r14 window (VERDICT r13 #1: keep draining the stale ledger —
# oldest grades first; tools/evidence_audit.py is the ordering
# source):
# - the 5 NEW r14 keys (never driver-graded): sink_geotiff_lzw
#   (VERDICT r13 #6 — write-side TIFF-LZW + predictor 3 + projected
#   CRS, hash-gated through write→catalog→read),
#   raster_mosaic_crs_groups (per-CRS mosaic planning off the
#   catalog's new crs column), fn_utm_forward (Snyder transverse-
#   Mercator forward series, zone 27N), raster_focal_gaussian_sep
#   (separable 5×5 blur hash-proven against the direct 2-D oracle)
#   and stat_ks_test (exact two-sample Kolmogorov–Smirnov),
# - the 10 keys the CRS-geokey change (VERDICT r13 #2) touched:
#   regenerated fixtures (scan_geotiff_* / raster_mosaic_hetero /
#   raster_extent_prune), the extended catalog oracle
#   (scan_raster_catalog), the geokey-emitting sinks
#   (sink_geotiff / sink_geotiff_pyramid) and the level-pick
#   dispatch rewrite (raster_overview_prune, VERDICT r13 #4),
# - the 30 remaining r6-era stale keys (clears the r6 tail entirely),
# - the 5 oldest r7-era stale keys.
# r15+ walks the remaining r7/r8 tail.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never graded (new this round) ---
    "sink_geotiff_lzw",
    "raster_mosaic_crs_groups",
    "fn_utm_forward",
    "raster_focal_gaussian_sep",
    "stat_ks_test",
    # --- changed this round (CRS geokeys / fixtures / dispatch) ---
    "scan_raster_catalog",
    "scan_geotiff_mini",
    "scan_geotiff_overview",
    "scan_geotiff_mask1bit",
    "scan_geotiff_sparse",
    "raster_extent_prune",
    "raster_overview_prune",
    "raster_mosaic_hetero",
    "sink_geotiff",
    "sink_geotiff_pyramid",
    # --- the 30 remaining r6-era stale keys ---
    "dedup_url_canonical",
    "embed_gram_matrix",
    "fn_binary",
    "fn_map",
    "funnel_batch",
    "join_dpp",
    "join_null_safe",
    "pareto_customers",
    "raster_hillshade",
    "raster_reproject_nn",
    "raster_zonal_stats",
    "reshape_unpivot",
    "rle_events",
    "sample_temperature",
    "scd2_asof_lookup",
    "seq_markov",
    "seq_pattern_detect",
    "seq_transitions",
    "sessionize_batch",
    "sim_knn",
    "stream_cdc_apply",
    "stream_distinct_users",
    "text_compression_ratio",
    "text_context_windows",
    "text_repetition_ratio",
    "text_zipf_slope",
    "ts_pct_change",
    "ts_spike_detect",
    "win_count_distinct",
    "win_ratio_share",
    # --- the 5 oldest r7-era stale keys ---
    "ab_test_proportions",
    "agg_benford_profile",
    "agg_corr_matrix",
    "agg_gini",
    "agg_hll_oracle",
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
