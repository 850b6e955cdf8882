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
# The r13 window (VERDICT r12 #1: keep draining the stale ledger —
# oldest grades first; tools/evidence_audit.py is the ordering
# source):
# - the 5 NEW r13 keys, never driver-graded: raster_overview_prune
#   (VERDICT r12 #2), raster_mosaic_hetero (VERDICT r12 #3), the
#   GeoTIFF write path sink_geotiff / sink_geotiff_pyramid, and the
#   tile zone-map prune raster_tile_zonemap,
# - the 2 keys whose plans changed this round (kmeans/NB, VERDICT #7),
# - the 25 remaining r5-era stale keys (clears the r5 tail entirely),
# - the 18 oldest r6-era stale keys.
# r14+ walks the remaining r6/r7 tail (stale-<r9 after r13: ≤126).
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never graded (new this round) ---
    "raster_overview_prune",
    "raster_mosaic_hetero",
    "sink_geotiff",
    "sink_geotiff_pyramid",
    "raster_tile_zonemap",
    # --- changed this round (iterative-loop shave, VERDICT r12 #7) ---
    "ml_kmeans_lloyd",
    "ml_naive_bayes",
    # --- the 25 remaining r5-era stale keys ---
    "join_asof_forward",
    "join_lateral",
    "mm_features",
    "mv_incremental",
    "raster_band_math",
    "raster_downsample",
    "raster_fill_idw",
    "raster_focal_mean",
    "raster_slope",
    "rfm_segments",
    "sample_reservoir",
    "sample_weighted",
    "scan_binary_files",
    "scan_pysource",
    "scan_text_lines",
    "sim_knn_label",
    "source_vocab_overlap",
    "spatial_join_grid",
    "stream_join_static",
    "stream_stream_join",
    "text_heavy_hitters",
    "text_url_domain",
    "tpch_q18",
    "win_ntile",
    "win_rolling_z",
    # --- the 18 oldest r6-era stale keys ---
    "agg_any_all",
    "agg_approx_percentile",
    "agg_bitmap_distinct",
    "agg_corr",
    "agg_decimal_exact",
    "agg_hll_partial_merge",
    "agg_mode",
    "agg_regression",
    "agg_salted_twophase",
    "agg_session_window",
    "agg_weighted_avg",
    "anomaly_mad",
    "attribution_first_touch",
    "basket_pairs",
    "basket_rules",
    "cohort_retention",
    "concurrency_peak",
    "dedup_edit_distance",
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
